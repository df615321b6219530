package graft.dev

import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSessions, Tables}

/** Scale-trend guard: the one failure class plan-shape budgets can't see
  * is a plan whose SHAPE is fine but whose work grows super-linearly in
  * the data — an accidentally de-blocked pair join, a window that stopped
  * partitioning, a broadcast that silently became a loop. This tool makes
  * the repo's "100x-safe" claims mechanically checkable: run the heaviest
  * queries at sf0.01 AND sf0.1 (documents/lineitem/events all grow 10x)
  * and flag any query whose wall-time grew more than `maxRatio` (default
  * 25 — 10x data, ~linear growth, 2.5x margin for constant factors and
  * log terms; a quadratic operator shows ~100x and clears the bar by 4x).
  *
  * Noise handling, so the guard doesn't cry wolf:
  *  - each side is timed min-of-REPEATS (default 2), same contention
  *    damping as Bench;
  *  - small-side times are FLOORED (default 0.4 s) before the ratio:
  *    a 0.05 s query that grows to 1 s is constant-overhead noise, not
  *    a scale break — the floor means only queries doing real work at
  *    sf0.1 (t >= floor * maxRatio = 10 s) can flag on a tiny base.
  *
  * Self-test: SPARK_GRAFT_SCALE_INJECT=1 appends `__injected_quadratic`
  * — a deliberately DE-BLOCKED within-source all-pairs shingle compare
  * (the exact bug class the blocked dedups avoid: pair count grows
  * ~100x when docs grow 10x). The guard must flag it; verified by hand
  * per the round-8 checklist (see ScaleTrendSpec for the logic's unit
  * coverage).
  *
  * Usage: runMain graft.dev.ScaleTrend [smallDir largeDir [topN|names]]
  * Ranks the battery by a one-pass small-SF timing, then times the top-N
  * (default 30) on both SFs. Exits nonzero if anything flags.
  */
object ScaleTrend {

  /** One query's growth verdict. */
  final case class Trend(name: String, tSmall: Double, tLarge: Double,
                         ratio: Double, flagged: Boolean)

  /** Pure flagging core (unit-tested in ScaleTrendSpec): ratio of
    * large-SF to FLOORED small-SF time, flagged above `maxRatio`.
    * A failed run on either side (negative time) is always flagged —
    * a query that only fails at the larger SF is the worst scale bug
    * of all and must never pass silently. */
  def evaluate(times: Seq[(String, Double, Double)], floorSec: Double,
               maxRatio: Double): Seq[Trend] =
    times.map { case (name, tS, tL) =>
      if (tS < 0 || tL < 0)
        Trend(name, tS, tL, Double.PositiveInfinity, flagged = true)
      else {
        val r = tL / math.max(tS, floorSec)
        Trend(name, tS, tL, math.rint(r * 100) / 100, r > maxRatio)
      }
    }.sortBy(-_.ratio)

  /** The injected quadratic: within-source ALL-PAIRS shingle-set compare
    * — no LSH blocking, no posting-list grouping, the shape every
    * blocked dedup in this repo exists to avoid. Docs grow 10x from
    * sf0.01 to sf0.1 at constant source count, so the pair count grows
    * ~100x and per-pair set ops keep the cost pair-bound. */
  private def injectedQuadratic(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.ExprColumns.shingles(spark, "text", 5).as("sh"))
    d.as("a").join(d.as("b"),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  def main(args: Array[String]): Unit = {
    val smallDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val largeDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val sel = if (args.length > 2) args(2) else "30"
    val repeats = sys.env.get("SPARK_GRAFT_SCALE_REPEATS").map(_.toInt).getOrElse(2)
    val floorSec = sys.env.get("SPARK_GRAFT_SCALE_FLOOR").map(_.toDouble).getOrElse(0.4)
    val maxRatio = sys.env.get("SPARK_GRAFT_SCALE_MAX_RATIO").map(_.toDouble).getOrElse(25.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inject = sys.env.get("SPARK_GRAFT_SCALE_INJECT").contains("1")
    val battery: Seq[(String, (SparkSession, String) => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1) ++
        (if (inject) Seq("__injected_quadratic" ->
          ((s: SparkSession, d: String) => injectedQuadratic(s, d))) else Nil)

    def time(fn: (SparkSession, String) => DataFrame, dir: String,
             reps: Int = repeats): Double = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // NonFatal only: a fatal JVM error (OOM, stack overflow) must
        // propagate and kill the run, not be converted into a -1 "flag"
        // that reads as a clean scale-bug detection on a dead JVM
        val ok = try {
          fn(spark, dir).write.format("noop").mode("overwrite").save(); true
        } catch { case NonFatal(_) => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      if (runs.exists(_ < 0)) -1.0
      else math.rint(runs.min * 1000) / 1000
    }

    // pick the candidate set: explicit names, or top-N by a one-pass
    // small-SF ranking run (cheap; rank order only needs to be roughly
    // right — a heavy query mis-ranked 31st is caught next round when
    // it climbs)
    val chosen: Seq[(String, (SparkSession, String) => DataFrame)] =
      if (sel.nonEmpty && sel.forall(_.isDigit)) {
        val n = sel.toInt
        // single-run ranking pass: only rough ORDER matters here, and it
        // doubles as session warmup before the measured runs below
        val ranked = battery.map { case (name, fn) =>
          (name, fn, time(fn, smallDir, reps = 1))
        }
        val byCost = ranked.sortBy { case (_, _, t) =>
          if (t < 0) Double.NegativeInfinity else -t }
        (byCost.take(n) ++ byCost.filter(_._1.startsWith("__injected")))
          .distinct.map { case (name, fn, _) => (name, fn) }
      } else {
        val names = sel.split(",").map(_.trim).filter(_.nonEmpty).toSet
        require(names.nonEmpty,
          s"third argument must be a top-N count or a non-empty query list, got '$sel'")
        val unknown = names -- battery.map(_._1).toSet
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        battery.filter { case (n, _) => names.contains(n) }
      }

    val measured = chosen.map { case (name, fn) =>
      (name, time(fn, smallDir), time(fn, largeDir))
    }
    val trends = evaluate(measured, floorSec, maxRatio)
    trends.foreach { t =>
      val mark = if (t.flagged) "FLAG" else "ok  "
      println(f"[scale-trend] $mark ${t.name}%-28s small=${t.tSmall}%8.3fs " +
        f"large=${t.tLarge}%8.3fs ratio=${t.ratio}%7.2f")
    }
    val flagged = trends.filter(_.flagged)
    println(s"[scale-trend] checked=${trends.size} flagged=${flagged.size} " +
      s"(floor=${floorSec}s maxRatio=$maxRatio repeats=$repeats " +
      s"small=$smallDir large=$largeDir)")
    // Per-round artifact (round-8 verdict ask 1): growth regressions should
    // be diffable DATA across rounds, not prose in BENCH_STABILITY.md. Same
    // contract as BENCH_FULL.json — the tool always writes the full result,
    // the round checklist copies it to SCALE_r{N}.json. A ratio of -1 marks
    // a query that failed on a side (also flagged); infinity can't appear
    // in JSON so the failure encoding is explicit.
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_TREND.json")
    val rows = trends.map { t =>
      val ratio = if (t.ratio.isInfinity) -1.0 else t.ratio
      s""""${t.name}":{"t_small":${t.tSmall},"t_large":${t.tLarge},"ratio":$ratio,"flagged":${t.flagged}}"""
    }.mkString("{", ",", "}")
    val flaggedJson = flagged.map("\"" + _.name + "\"").mkString("[", ",", "]")
    Files.writeString(Paths.get(out),
      s"""{"metric":"scale_trend","checked":${trends.size},"flagged":$flaggedJson,""" +
        s""""floor_sec":$floorSec,"max_ratio":$maxRatio,"repeats":$repeats,""" +
        s""""small":"$smallDir","large":"$largeDir","queries":$rows}""")
    println(s"[scale-trend] artifact written to $out")
    spark.stop()
    if (flagged.nonEmpty) sys.exit(1)
  }
}
