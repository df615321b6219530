package graft

/** Every declared query runs on sf0.001 and (except where documented)
  * returns rows — the local image of the driver's t1 smoke. */
class QueriesSmokeSpec extends SparkSpec {
  test("entry returns rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("oracleSql covers every query") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only checks are allowed but should be the documented exceptions
    assert(missing.forall(_.endsWith("_noracle")), s"missing oracles: $missing")
  }
  test("no orphan oracles (an oracle without a query fails the driver compare)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.count() > 0)
    }
  }
}
