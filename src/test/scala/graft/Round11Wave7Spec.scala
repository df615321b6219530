package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Multimodal, Relational, Similarity}

/** Round-11 wave-7 operators: scalar replays for the constellation audio
  * fingerprint, multi-source closeness centrality, and the Theil
  * inequality decomposition. */
class Round11Wave7Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("mm_audio_fingerprint matches a scalar peak-pair replay") {
    val docs = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") % 3 === 1 && length(col("text")) > 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    def hashes(payload: Array[Byte]): Set[String] = {
      val energies = payload.grouped(32).map { chunk =>
        chunk.map(b => { val v = (b & 0xff) - 128; v.toLong * v }).sum
      }.toArray
      val peaks = energies.indices.filter { i =>
        val pe = if (i == 0) -1L else energies(i - 1)
        val ne = if (i == energies.length - 1) -1L else energies(i + 1)
        energies(i) > pe && energies(i) >= ne
      }
      (for {
        ai <- peaks.indices
        bi <- (ai + 1) to math.min(ai + 3, peaks.length - 1)
      } yield md5hex(s"${energies(peaks(ai)) / 4096}:" +
        s"${energies(peaks(bi)) / 4096}:${peaks(bi) - peaks(ai)}")).toSet
    }
    val sigs = docs.map { case (id, p) => (id, hashes(p)) }.toMap
    val df = sigs.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val exp = (for {
      (d1, h1) <- sigs; (d2, h2) <- sigs if d1 < d2
      shared = (h1 intersect h2).count(h => df(h) >= 2 && df(h) <= 64)
      if shared >= 2
    } yield ((d1, d2), (shared.toLong, h1.size.toLong, h2.size.toLong)))
      .toMap
    val got = Multimodal.audioFingerprint(spark, sf0001).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (sh, n1, n2) = exp((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === sh, s"n_shared ${r.getLong(0)}/${r.getLong(1)}")
      assert(r.getLong(3) === n1 && r.getLong(4) === n2)
      assert(math.abs(r.getDouble(5) - sh.toDouble / math.min(n1, n2))
        < 1e-6)
    }
  }

  test("graph_closeness matches a scalar 3-seed BFS replay") {
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val adj = (edges ++ edges.map(e => (e._1, e._3, e._2))).distinct
      .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).toSet).toMap
    val nodes = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val got = Graph.closenessCentrality(spark, sf0001).collect()
    val byLabel = nodes.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byLabel.foreach { case (label, vs) =>
      vs.sorted.take(3).foreach { seed =>
        var visited = Set(seed); var frontier = Set(seed)
        val dist = scala.collection.mutable.Map[Long, Int]()
        for (d <- 1 to 3) {
          frontier = frontier.flatMap(n =>
            adj.getOrElse((label, n), Set.empty)) -- visited
          frontier.foreach(n => dist(n) = d)
          visited ++= frontier
        }
        val r = got.find(x => x.getInt(0) == label && x.getLong(1) == seed)
        assert(r.isDefined && r.get.getLong(2) === dist.size.toLong,
          s"n_reached $label/$seed")
        assert(r.get.getLong(4) === dist.values.map(_.toLong).sum)
        val harm = dist.values.map(d => BigDecimal(1.0 / d)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
        assert(math.abs(r.get.getDouble(6) - harm.toDouble) < 1e-6)
        assert(r.get.getLong(3) === vs.length - 1 - dist.size)
      }
    }
  }

  test("orders_theil_decomp matches a scalar replay and the " +
    "decomposition identity holds") {
    val got = Relational.theilDecomp(spark, sf0001).collect()
    assert(got.nonEmpty)
    val within = got.map(_.getDouble(5)).sum
    val between = got.map(_.getDouble(6)).sum
    val total = got.head.getDouble(7)
    assert(math.abs(total - (within + between)) < 1e-4,
      s"theil identity: $total vs ${within + between}")
    // shares partition the revenue
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // every within-group Theil is non-negative
    got.foreach(r => assert(r.getDouble(4) >= -1e-12))
  }
}
