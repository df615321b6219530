package graft

import graft.dev.BenchDiff

/** Unit coverage for the cross-round bench diff's parser and comparison
  * core (the tool itself is a round-checklist main — graft.dev.BenchDiff
  * — run against the committed BENCH_r{N}.json artifacts). */
class BenchDiffSpec extends SparkSpec {

  test("parses the queries map out of a BENCH_FULL-shaped artifact") {
    val json = """{"metric":"total","value":12.3,"unit":"sec","agg":"min_of_2",""" +
      """"run_totals":[13.0,12.3],"contended":false,"floor_total":165.75,""" +
      """"failed":0,"n_queries":3,"queries":{"q1":1.5,"q2":0.25,"q3":-1.0},""" +
      """"sf":"/root/testdata/sf0.1"}"""
    assert(BenchDiff.parseQueries(json) ===
      Map("q1" -> 1.5, "q2" -> 0.25, "q3" -> -1.0))
  }

  test("regressions and improvements past the gate flag; noise does not") {
    val old = Map("stable" -> 2.0, "worse" -> 2.0, "better" -> 3.0,
      "noise" -> 2.0, "tiny" -> 0.1)
    val nw = Map("stable" -> 2.1, "worse" -> 3.5, "better" -> 1.8,
      "noise" -> 2.6, "tiny" -> 0.3)
    val (regs, imps) = BenchDiff.diff(old, nw, gatePct = 40.0, floorSec = 0.5)
    // worse: 2.0 -> 3.5 = +75% past the 40% gate
    assert(regs.map(_.name) === Seq("worse"))
    assert(regs.head.pct === 75.0)
    // better: 3.0 -> 1.8; flag needs old > max(new, floor)*1.4 = 2.52 — yes
    assert(imps.map(_.name) === Seq("better"))
    // noise: +30% under the gate; tiny: +200% but floored (0.1s -> 0.3s is
    // constant overhead, both sides under the 0.5s floor)
    assert(!regs.exists(d => d.name == "noise" || d.name == "tiny"))
  }

  test("failed runs (-1) and one-sided queries never enter the comparison") {
    val old = Map("gone" -> 1.0, "failed_old" -> -1.0, "both" -> 1.0)
    val nw = Map("new" -> 1.0, "failed_old" -> 9.0, "both" -> 1.0)
    val (regs, imps) = BenchDiff.diff(old, nw, gatePct = 40.0, floorSec = 0.5)
    assert(regs.isEmpty && imps.isEmpty)
  }

  test("floor damping is symmetric: a sub-floor new side cannot flag an " +
    "improvement") {
    // 0.4 -> 0.05 is -87% but both flag sides sit under the floor once
    // lifted: old (0.4) must exceed max(0.05, 0.5)*1.4 = 0.7 — it doesn't
    val (regs, imps) = BenchDiff.diff(
      Map("q" -> 0.4), Map("q" -> 0.05), gatePct = 40.0, floorSec = 0.5)
    assert(regs.isEmpty && imps.isEmpty)
  }
}
