package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so scheduler + codegen + parquet-reader init cost
    // is not attributed to whichever query happens to run first; region is
    // the smallest table (a few KB)
    spark.range(1000).selectExpr("sum(id)").collect()
    try {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      // warm the vectorized parquet reader + hash-agg codegen + noop sink
      // paths on a real fact-table scan, so the first timed query (sorted
      // order: agg_stats) isn't charged ~2s of one-time init
      Tables(spark, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.sum("l_quantity"))
        .write.format("noop").mode("overwrite").save()
      Tables(spark, sfDir, "events").selectExpr("max(ts)").collect()
      // class-load + interpreter-init for the custom expressions on one
      // row (NOT a query pre-run: plans still pay their own codegen)
      graft.functions.ExprColumns.register(spark)
      spark.sql("""SELECT graft_simhash64(array('a','b')),
        graft_minhash_buckets(array('a','b')),
        graft_hashed_tf64(array('a','b')),
        graft_shingles('a b c d e f', 5),
        graft_chunk_words('a b c', 2, 1),
        graft_cosine_f32(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))),
        graft_hyperplane_lsh(array(CAST(1.0 AS FLOAT))),
        graft_parse_af_ts('2024-01-01 00:00:00')""").collect()
      // warm the Structured Streaming machinery (microbatch threads,
      // checkpoint fs, state-store providers) on the smallest table so the
      // first timed stream_* query isn't charged ~4s of one-time init
      val regionSchema = spark.read.parquet(s"$sfDir/region.parquet").schema
      graft.streaming.StreamingOps.runAvailableNow(
        spark.readStream.schema(regionSchema).option("basePath", sfDir)
          .parquet(s"$sfDir/region.*").groupBy("r_regionkey").count(),
        mode = "complete").collect()
      // ...and the stream-stream join + session-window state machinery
      // (each allocates its own store kind on first use; without this the
      // init cost lands on the first stream_join_*/stream_session_* query)
      import org.apache.spark.sql.functions.{col, current_timestamp, session_window}
      def tinyStream = spark.readStream.schema(regionSchema)
        .option("basePath", sfDir).parquet(s"$sfDir/region.*")
        .withColumn("t", current_timestamp())
      val l = tinyStream.select(col("r_regionkey").as("k"), col("t").as("lt"))
        .withWatermark("lt", "1 minute")
      val r = tinyStream.select(col("r_regionkey").as("k2"), col("t").as("rt"))
        .withWatermark("rt", "1 minute")
      graft.streaming.StreamingOps.runAvailableNow(
        l.join(r, col("k") === col("k2") &&
          col("rt") >= col("lt") - org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE") &&
          col("rt") <= col("lt")), mode = "append").collect()
      graft.streaming.StreamingOps.runAvailableNow(
        tinyStream.groupBy(session_window(col("t"), "1 minute"), col("r_regionkey"))
          .count(), mode = "complete").collect()
    } catch { case _: Throwable => () }
    // sorted for stable cross-round attribution; noop sink forces FULL
    // materialization of every output column (count() would let Catalyst
    // skip the projections of map-only queries entirely)
    // -1.0 = query failed (kept visible rather than swallowed); timings
    // rounded to ms so the single JSON line stays well inside the driver's
    // tail-capture window (round-1 line was too long and failed to parse)
    // stream_* queries run LAST: their state-store providers stay loaded
    // after completion and any residual maintenance IO must not land on a
    // later batch query's timing (observed 3-20x inflation in round 2)
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the battery (dev tooling for
    // isolating one query's timing from a 159-query run; the driver never
    // sets it, so round artifacts are always the full battery)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly — silently filtering to zero queries
    // would print a plausible 0.0s summary that reads as an instant pass
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    val ordered = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy { case (n, _) => (n.startsWith("stream_"), n) }
    // BENCH_STABILITY.md's protocol: a single run on a shared box can show
    // 3-20x wobble on individual queries, so one run must never be the
    // round's artifact. Run the full battery REPEATS times (default 2) and
    // record the per-query MIN across runs — the min is the least-contended
    // observation and the number the stability doc's floors are built from.
    // Both per-run totals are emitted so contention is visible, not hidden.
    // a typo'd/zero REPEATS must fail loudly (same contract as BENCH_ONLY):
    // silently falling back to 2 would record an artifact under different
    // conditions than the operator asked for
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS") match {
      case None => 2
      case Some(s) =>
        val n = scala.util.Try(s.trim.toInt).getOrElse(
          throw new IllegalArgumentException(
            s"SPARK_GRAFT_BENCH_REPEATS must be a positive int, got '$s'"))
        require(n >= 1,
          s"SPARK_GRAFT_BENCH_REPEATS must be >= 1, got $n")
        n
    }
    // Calibration probe (r15 verdict item 2): contention used to be
    // inferred AFTER the run from run-to-run spread, which ended three
    // straight rounds in hand-written "box contention" adjudication. A
    // fixed ~0.3 s canonical query (lineitem scan + one hash-agg shuffle —
    // the battery's modal plan shape) is re-run every CALIB_EVERY battery
    // queries; the probe's code never changes across rounds, so its
    // dispersion measures the BOX, not the battery. A contended window now
    // self-reports inside the artifact (calib_dispersion = pooled
    // median/min; an idle box reads ~1.0-1.15), and a single-query outlier
    // has an in-run control to diff against (per-probe series in
    // BENCH_FULL.json).
    val calibEvery = 25
    def calibProbe(): Double = {
      val t0 = System.nanoTime()
      try {
        Tables(spark, sfDir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(org.apache.spark.sql.functions.sum("l_quantity").as("sq"),
            org.apache.spark.sql.functions.avg("l_extendedprice").as("ap"))
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () }
      math.rint((System.nanoTime() - t0) / 1e9 * 1000) / 1000
    }
    def runBattery(): (Map[String, Double], Vector[Double]) = {
      val calib = Vector.newBuilder[Double]
      calib += calibProbe()
      val res = ordered.zipWithIndex.map { case ((name, fn), i) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // Drop the query's leftover localCheckpoint caches NOW (outside
        // its timing window): ContextCleaner frees them only after a GC
        // notices the dead references, which a large heap defers for
        // whole battery runs — the r16 min-of-5 recording degraded
        // monotonically 673 -> 964 s/run from exactly this accumulation
        // (calib probe medians 0.32 -> 0.41 in the same runs). Every
        // query is self-contained, so nothing live is evicted.
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        if ((i + 1) % calibEvery == 0 && i + 1 < ordered.size) calib += calibProbe()
        name -> (if (ok) math.rint(dt * 1000) / 1000 else -1.0)
      }.toMap
      calib += calibProbe()
      // between-runs floor reset: collect the freed cache/broadcast refs
      // so run N+1 starts from the same heap the first run saw
      System.gc()
      (res, calib.result())
    }
    // Idle-box gate (r7 verdict: both BENCH_r07 run totals landed 35-50%
    // above the repo's documented clean floor — min-of-2 damped it but the
    // artifact was still recorded under contention). The floor is PER-QUERY
    // (clean r7: 126.55s / 168 queries ≈ 0.75 s/q, BENCH_STABILITY.md) so
    // it survives battery growth; a run whose total exceeds
    // n*floor*margin is contended. If EVERY initial run is contended, one
    // extra battery runs to try for a quieter window; if the best total
    // still exceeds the gate the artifact self-labels with
    // "contended":true instead of masquerading as a clean number.
    // Floors come from the COMMITTED artifact BENCH_FLOOR.json
    // (ADVICE r14: a hardcoded constant cannot go stale against the
    // recording it cites — the artifact and BENCH_STABILITY.md move
    // together). Env override > artifact > last-resort constant (the
    // round-14 recording, kept only for runs outside the repo root).
    // Anchored to line start (ADVICE r15): the artifact's long "comment"
    // string could otherwise quote an example key (e.g. `"floor_run_total_s":
    // 1.0`) and be matched first; real fields sit at the start of their own
    // line, the comment is one line with text before any quoted key.
    def floorField(name: String): Option[Double] = {
      val p = Paths.get("BENCH_FLOOR.json")
      if (!Files.exists(p)) None
      else s"""(?m)^\\s*"$name"\\s*:\\s*([0-9.]+)""".r
        .findFirstMatchIn(new String(Files.readAllBytes(p), "UTF-8"))
        .map(_.group(1).toDouble)
    }
    def perQ(total: String, battery: String): Option[Double] = for {
      t <- floorField(total); b <- floorField(battery); if b > 0
    } yield math.rint(t / b * 1000) / 1000
    // Which source each floor came from is emitted in the artifact
    // (ADVICE r15): a renamed/malformed artifact key silently falling back
    // to the hardcoded constant would otherwise leave no signal that the
    // gate is running on a stale floor.
    def floorOf(envKey: String, totalKey: String, batteryKey: String,
                fallback: Double): (Double, String) =
      sys.env.get(envKey).map(v => (v.trim.toDouble, "env"))
        .orElse(perQ(totalKey, batteryKey).map(v => (v, "artifact")))
        .getOrElse((fallback, "fallback"))
    val (floorPerQ, floorSrc) =
      // round-14 recalibration (verdict item 5): 0.75 dated from the
      // 168-query battery; two rounds in a row flagged `contended` on
      // runs that beat the gray gate, because run totals on a VERIFIED
      // IDLE box now sit at 1.06-1.16 s/q (501.4-550.6 s / 473 — the
      // round-14 min-of-4 recording, BENCH_STABILITY.md). The gate
      // compares RUN totals, so the floor is the cleanest idle RUN
      // total per query (501.436 / 473), not the min-of aggregate.
      floorOf("SPARK_GRAFT_BENCH_FLOOR_PER_QUERY",
        "floor_run_total_s", "floor_battery", 1.06)
    val contendedMargin = 1.30
    // Gray-zone gate (r8 verdict nit 1): the contended gate passes any run
    // under n*floor*1.30, so a round whose committed total lands 15-30%
    // above the BEST total this code family has ever recorded clean would
    // still read as clean. Track that best as a PER-QUERY value (it must
    // survive battery growth; see BENCH_STABILITY.md for the history) and
    // flag "gray_zone" when the committed MIN-OF-RUNS total exceeds
    // best*1.15 — auto-repeating once first to try for a quieter window.
    // The comparison is min-of-queries total vs min-of-queries total:
    // single RUN totals sit systematically ~10% above the min-of
    // aggregate (independent per-query noise), so comparing a run total
    // against a min-of-derived floor would flag clean rounds. Update the
    // env default when a new clean floor is recorded.
    val (bestPerQ, bestSrc) =
      // round-14 clean floor (verdict item 5): 462.457 s min-of-4 at the
      // 473 battery on a verified-idle box = 0.978 s/q. The previous
      // 0.92 was the round-11 recording at 365 queries; the rows added
      // since (exactRank re-plans, winnowing/tokenizer/streaming-index
      // families) average heavier, so the drift is battery COMPOSITION,
      // not environment — see BENCH_STABILITY.md round-14 record.
      floorOf("SPARK_GRAFT_BENCH_BEST_PER_QUERY",
        "best_minof_total_s", "best_battery", 0.978)

    val grayMargin = 1.15
    def runTotal(r: Map[String, Double]): Double =
      math.rint(r.values.filter(_ >= 0).sum * 1000) / 1000
    // min-of-queries total across a set of runs — the artifact's "value".
    // An all-runs-failed query must NOT shrink this total (a round with
    // several hard failures could otherwise slip under the gray gate while
    // looking faster than the clean floor): charge it the historical best
    // per-query cost instead of 0. Failures are still reported separately
    // via nFail / the -1.0 sentinel in the per-query map.
    def minOfTotal(rs: Seq[Map[String, Double]]): Double =
      math.rint(ordered.map { case (n, _) =>
        val ts = rs.map(_(n)).filter(_ >= 0)
        if (ts.nonEmpty) ts.min else bestPerQ
      }.sum * 1000) / 1000
    val initialPairs = (1 to repeats).map(_ => runBattery())
    val gate = ordered.size * floorPerQ * contendedMargin
    val grayGate = ordered.size * bestPerQ * grayMargin
    val pairs =
      if (only.isEmpty &&
          (initialPairs.forall(p => runTotal(p._1) > gate) ||
            minOfTotal(initialPairs.map(_._1)) > grayGate))
        initialPairs :+ runBattery()
      else initialPairs
    val runs = pairs.map(_._1)
    val calibRuns = pairs.map(_._2)
    val runTotals = runs.map(runTotal)
    val contended = runTotals.min > gate
    val grayZone = minOfTotal(runs) > grayGate
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n == 0) 0.0
      else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val calibAll = calibRuns.flatten.filter(_ > 0)
    val calibMin = if (calibAll.nonEmpty) calibAll.min else 0.0
    val calibMed = median(calibAll)
    val calibMax = if (calibAll.nonEmpty) calibAll.max else 0.0
    // pooled median/min: the min is the box's achievable floor for this
    // fixed plan, the median is what the battery actually experienced
    val calibDispersion =
      if (calibMin > 0) math.rint(calibMed / calibMin * 1000) / 1000 else -1.0
    // per-query min over SUCCESSFUL runs; -1.0 only if the query failed in
    // every run (a one-run flake must not masquerade as a timing)
    val results: Map[String, Double] = ordered.map { case (name, _) =>
      val ts = runs.map(_(name)).filter(_ >= 0)
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }.toMap
    val good = results.values.filter(_ >= 0)
    val total = math.rint(good.sum * 1000) / 1000
    val nFail = results.values.count(_ < 0)
    // The driver captures only the last ~2000 chars of output; the full
    // 100+-entry per-query map no longer fits that window (the round-1
    // line already overflowed it once at 68 queries). Full timings go to
    // a repo file; the one printed line stays well under the window with
    // the slowest 15 queries inlined for at-a-glance attribution.
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val full = jmap(results.toSeq.sortBy(_._1))
    val totalsJson = runTotals.mkString("[", ",", "]")
    // a filtered dev run must never clobber the round's full-battery artifact
    val gateJson =
      s""""contended":$contended,"floor_total":${math.rint(gate * 100) / 100},""" +
        s""""gray_zone":$grayZone,"gray_total":${math.rint(grayGate * 100) / 100},""" +
        s""""floor_src":"$floorSrc","best_src":"$bestSrc",""" +
        s""""calib_dispersion":$calibDispersion"""
    val calibJson =
      s""""calib":{"every":$calibEvery,"n":${calibAll.size},"min":$calibMin,""" +
        s""""med":$calibMed,"max":$calibMax,"dispersion":$calibDispersion,""" +
        s""""run_med":${calibRuns.map(r => median(r.filter(_ > 0))).mkString("[", ",", "]")},""" +
        s""""runs":${calibRuns.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")}}"""
    if (only.isEmpty) Files.writeString(Paths.get("BENCH_FULL.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","agg":"min_of_${runs.size}","run_totals":$totalsJson,$gateJson,$calibJson,"failed":$nFail,"n_queries":${results.size},"queries":$full,"sf":"$sfDir"}""")
    val top = results.toSeq.sortBy(-_._2).take(15)
      .map { case (k, v) => k -> math.rint(v * 100) / 100 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","agg":"min_of_${runs.size}","run_totals":$totalsJson,$gateJson,"failed":$nFail,"n_queries":${results.size},"queries":${jmap(top)},"queries_full":"BENCH_FULL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
