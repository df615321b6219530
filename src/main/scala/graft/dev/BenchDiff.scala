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

  /** Extracts the flat `"queries":{...}` map from one artifact, plus
    * whether it was recovered from a driver `BENCH_r{N}.json` "tail"
    * wrapper. The tail holds Bench's PRINTED line, which inlines only
    * the 15 slowest queries — a diff against it covers a fraction of
    * the battery, so the caller must surface that loudly (a silent
    * top-15 diff would read as "0 regressions" with 160+ queries never
    * compared). Prefer the committed BENCH_FULL.json (or
    * `git show <round-commit>:BENCH_FULL.json`) for full coverage. */
  def parseQueriesTagged(raw: String): (Map[String, Double], Boolean) = {
    val key = "\"queries\":{"
    val fromTail = !raw.contains(key)
    val json = if (fromTail) raw.replace("\\\"", "\"") else raw
    val start = json.indexOf(key)
    require(start >= 0, s"no \"queries\" object found")
    val body = json.substring(start + key.length, json.indexOf('}', start))
    val m =
      if (body.trim.isEmpty) Map.empty[String, Double]
      else body.split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
      }.toMap
    (m, fromTail)
  }

  def parseQueries(raw: String): Map[String, Double] =
    parseQueriesTagged(raw)._1

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
    // pct denominator lifted to 1 ms (Bench rounds to ms, so a recorded
    // 0.0 would otherwise print Infinity and a 0.0->0.0 NaN would poison
    // the sort); the FLAG thresholds already floor-damp separately
    val rows = common.map(n =>
      Delta(n, old(n), nw(n),
        math.rint((nw(n) - old(n)) / math.max(old(n), 0.001) * 1000) / 10))
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
    val (oldQ, oldTail) = parseQueriesTagged(Files.readString(Paths.get(args(0))))
    val (newQ, newTail) = parseQueriesTagged(Files.readString(Paths.get(args(1))))
    val (regs, imps) = diff(oldQ, newQ, gatePct, floorSec)
    def fmt(d: Delta) =
      f"  ${d.name}%-28s ${d.tOld}%7.2fs -> ${d.tNew}%7.2fs  ${d.pct}%+7.1f%%"
    val added = (newQ.keySet -- oldQ.keySet).toSeq.sorted
    val removed = (oldQ.keySet -- newQ.keySet).toSeq.sorted
    def total(m: Map[String, Double]) = m.values.filter(_ >= 0).sum
    println(f"[bench-diff] old: ${args(0)} total=${total(oldQ)}%.1fs n=${oldQ.size}")
    println(f"[bench-diff] new: ${args(1)} total=${total(newQ)}%.1fs n=${newQ.size}")
    // a driver-tail artifact holds only the printed top-15 — say so
    // LOUDLY: "0 regressions" over a 15-query slice is not a clean bill
    Seq(args(0) -> oldTail, args(1) -> newTail).foreach { case (f, t) =>
      if (t) println(s"[bench-diff] WARNING: $f is a driver tail artifact " +
        "(top-15 slice only) — compared queries are a fraction of the " +
        "battery; diff the committed BENCH_FULL.json for full coverage")
    }
    val compared = (oldQ.keySet & newQ.keySet)
      .count(n => oldQ(n) >= 0 && newQ(n) >= 0)
    println(s"[bench-diff] compared=$compared of old=${oldQ.size}/new=${newQ.size}")
    println(f"[bench-diff] regressions > $gatePct%.0f%% (floor ${floorSec}s): ${regs.size}")
    regs.foreach(d => println(fmt(d)))
    println(f"[bench-diff] improvements > $gatePct%.0f%%: ${imps.size}")
    imps.foreach(d => println(fmt(d)))
    if (added.nonEmpty)
      println(s"[bench-diff] added (${added.size}): ${added.mkString(", ")}")
    if (removed.nonEmpty)
      println(s"[bench-diff] removed (${removed.size}): ${removed.mkString(", ")}")
    // a query that failed before and succeeds now re-enters the timing
    // set — name it rather than letting a fix+regression combo hide
    val recovered = (oldQ.keySet & newQ.keySet).toSeq
      .filter(n => oldQ(n) < 0 && newQ(n) >= 0).sorted
    if (recovered.nonEmpty)
      println(s"[bench-diff] recovered from failure (${recovered.size}): " +
        recovered.map(n => s"$n=${newQ(n)}s").mkString(", "))
    val failedNew = newQ.filter(_._2 < 0).keys.toSeq.sorted
    if (failedNew.nonEmpty)
      println(s"[bench-diff] FAILED in new (${failedNew.size}): ${failedNew.mkString(", ")}")
    if (regs.nonEmpty || failedNew.nonEmpty) sys.exit(1)
  }
}
