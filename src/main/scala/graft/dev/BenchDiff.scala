package graft.dev

import java.nio.file.{Files, Paths}

/** Cross-round bench diff (r8 verdict ask 3): reads two BENCH_FULL-shaped
  * artifacts (the committed `BENCH_r{N}.json` / `BENCH_FULL.json` files —
  * one JSON object with a `"queries":{name:sec,...}` map) and prints, in
  * one pass, what the verdict has been hand-deriving every round:
  *
  *  - per-query REGRESSIONS beyond the noise gate (default 40%, the
  *    documented shared-box wobble ceiling in BENCH_STABILITY.md) with an
  *    absolute-floor damping (default 0.5 s — a 0.1 s query "growing" to
  *    0.2 s is constant overhead, not a regression);
  *  - improvements beyond the same gate (plan wins should be named, not
  *    just losses);
  *  - queries added / removed between the rounds;
  *  - totals and per-query means of both sides.
  *
  * No JSON library is available offline, so the parser is a deliberately
  * narrow scanner for the `"queries"` object this repo's own Bench writes
  * (flat string->number map, no nesting, no escapes in names). Exit code
  * 1 when regressions exist, so the round checklist can gate on it.
  *
  * Usage: runMain graft.dev.BenchDiff oldFile newFile [gatePct [floorSec]]
  */
object BenchDiff {

  /** Extracts the flat `"queries":{...}` map from one artifact. The
    * driver's `BENCH_r{N}.json` wraps the bench line as an ESCAPED string
    * inside a `"tail"` field — when the literal key is absent, unescape
    * once and retry (the driver artifact's own keys carry no `queries`
    * object, so the unescaped match is unambiguous). */
  def parseQueries(raw: String): Map[String, Double] = {
    val key = "\"queries\":{"
    val json = if (raw.contains(key)) raw else raw.replace("\\\"", "\"")
    val start = json.indexOf(key)
    require(start >= 0, s"no \"queries\" object found")
    val body = json.substring(start + key.length, json.indexOf('}', start))
    if (body.trim.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
    }.toMap
  }

  /** One comparison row. */
  final case class Delta(name: String, tOld: Double, tNew: Double, pct: Double)

  /** Pure core (unit-tested in BenchDiffSpec): queries present on both
    * sides with non-negative times, split into regressions and
    * improvements past the gate. The reported pct is the conventional
    * (new-old)/old; the FLAG uses floor damping — a side under `floorSec`
    * is lifted to it first, so a 0.1s->0.2s move (constant overhead, not
    * a plan change) can never flag in either direction. */
  def diff(old: Map[String, Double], nw: Map[String, Double],
           gatePct: Double, floorSec: Double): (Seq[Delta], Seq[Delta]) = {
    val common = (old.keySet & nw.keySet).toSeq
      .filter(n => old(n) >= 0 && nw(n) >= 0)
    val rows = common.map(n =>
      Delta(n, old(n), nw(n),
        math.rint((nw(n) - old(n)) / old(n) * 1000) / 10))
    val f = 1 + gatePct / 100
    val regs = rows
      .filter(d => d.tNew > math.max(d.tOld, floorSec) * f)
      .sortBy(-_.pct)
    val imps = rows
      .filter(d => d.tOld > math.max(d.tNew, floorSec) * f)
      .sortBy(_.pct)
    (regs, imps)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff oldFile newFile [gatePct [floorSec]]")
    val gatePct = if (args.length > 2) args(2).toDouble else 40.0
    val floorSec = if (args.length > 3) args(3).toDouble else 0.5
    val oldQ = parseQueries(Files.readString(Paths.get(args(0))))
    val newQ = parseQueries(Files.readString(Paths.get(args(1))))
    val (regs, imps) = diff(oldQ, newQ, gatePct, floorSec)
    def fmt(d: Delta) =
      f"  ${d.name}%-28s ${d.tOld}%7.2fs -> ${d.tNew}%7.2fs  ${d.pct}%+7.1f%%"
    val added = (newQ.keySet -- oldQ.keySet).toSeq.sorted
    val removed = (oldQ.keySet -- newQ.keySet).toSeq.sorted
    def total(m: Map[String, Double]) = m.values.filter(_ >= 0).sum
    println(f"[bench-diff] old: ${args(0)} total=${total(oldQ)}%.1fs n=${oldQ.size}")
    println(f"[bench-diff] new: ${args(1)} total=${total(newQ)}%.1fs n=${newQ.size}")
    println(s"[bench-diff] regressions > $gatePct%% (floor ${floorSec}s): ${regs.size}")
    regs.foreach(d => println(fmt(d)))
    println(s"[bench-diff] improvements > $gatePct%%: ${imps.size}")
    imps.foreach(d => println(fmt(d)))
    if (added.nonEmpty)
      println(s"[bench-diff] added (${added.size}): ${added.mkString(", ")}")
    if (removed.nonEmpty)
      println(s"[bench-diff] removed (${removed.size}): ${removed.mkString(", ")}")
    val failedNew = newQ.filter(_._2 < 0).keys.toSeq.sorted
    if (failedNew.nonEmpty)
      println(s"[bench-diff] FAILED in new (${failedNew.size}): ${failedNew.mkString(", ")}")
    if (regs.nonEmpty || failedNew.nonEmpty) sys.exit(1)
  }
}
