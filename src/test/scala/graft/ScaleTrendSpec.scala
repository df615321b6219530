package graft

import graft.dev.ScaleTrend

/** Unit coverage for the scale-trend guard's flagging core (the tool
  * itself is a per-round main — graft.dev.ScaleTrend — whose end-to-end
  * drive, including the injected-quadratic self-test, is part of the
  * round checklist in the verify skill). */
class ScaleTrendSpec extends SparkSpec {

  test("linear growth within margin passes; super-linear flags") {
    val ts = ScaleTrend.evaluate(Seq(
      ("linear_10x", 1.0, 10.0),      // exactly data growth
      ("linear_margin", 1.0, 24.9),   // inside the 2.5x margin
      ("quadratic", 1.0, 100.0),      // the bug class: ~100x
      ("slightly_over", 1.0, 25.1)),  // just past the bar
      floorSec = 0.4, maxRatio = 25.0)
    val byName = ts.map(t => t.name -> t.flagged).toMap
    assert(!byName("linear_10x") && !byName("linear_margin"))
    assert(byName("quadratic") && byName("slightly_over"))
    // output is sorted worst-first so a round log leads with the break
    assert(ts.head.name == "quadratic")
  }

  test("small-side floor damps constant-overhead noise but cannot hide " +
    "real large-SF work") {
    val ts = ScaleTrend.evaluate(Seq(
      // 0.02s -> 1s is 50x raw but pure fixed-cost noise: floored ratio
      // 1/0.4 = 2.5 — no flag
      ("tiny_noise", 0.02, 1.0),
      // a tiny base CAN still flag once the large side does real work:
      // 0.02s -> 30s is 75x even against the floor
      ("tiny_base_quadratic", 0.02, 30.0)),
      floorSec = 0.4, maxRatio = 25.0)
    val byName = ts.map(t => t.name -> t.flagged).toMap
    assert(!byName("tiny_noise"))
    assert(byName("tiny_base_quadratic"))
  }

  test("a query that fails on either side always flags") {
    val ts = ScaleTrend.evaluate(Seq(
      ("fails_large", 1.0, -1.0), // OOM/timeout only at scale: worst bug
      ("fails_small", -1.0, 5.0),
      ("fine", 1.0, 8.0)),
      floorSec = 0.4, maxRatio = 25.0)
    val byName = ts.map(t => t.name -> t.flagged).toMap
    assert(byName("fails_large") && byName("fails_small") && !byName("fine"))
    assert(ts.head.ratio.isPosInfinity)
  }
}
