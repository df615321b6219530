package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}

/** Mechanical gate for THE recurring scale-defect class (shipped past
  * the oracle gate in rounds 9 and 12): an unpartitioned, un-limited
  * window over an unbounded-grain relation. An empty-partition
  * WindowExec requires AllTuples — ONE task holding the ENTIRE input,
  * regardless of upstream layout — so it is only acceptable when the
  * input is provably small. The oracle gate cannot catch this (the
  * answer is correct either way); only a plan gate can.
  *
  * Boundedness here is a conservative static analysis over the
  * OPTIMIZED logical plan: a relation is bounded when every path to a
  * leaf passes a cardinality bound the analysis can see —
  *
  *   - a `WindowGroupLimit` (a rank-limit filter the optimizer pushed
  *     map-side: the window's input is top-k, the house `rank <= k`
  *     discipline) or an explicit `Limit`;
  *   - an `Aggregate` whose grouping references NO entity-identifier
  *     column (value-domain histograms, calendar grains, type/label
  *     censuses — the house histogram-CDF discipline). Grouping by
  *     `*_id` / `*key` / `k` / `grp` columns scales with the data and
  *     bounds nothing;
  *   - a small `Range` (literal enumerations);
  *   - joins of bounded inputs (semi/anti need only a bounded left).
  *
  * Queries whose global windows are bounded for reasons the analysis
  * cannot see (e.g. a grain bounded by documented sampling) must be
  * whitelisted BY NAME with the justification next to the entry — the
  * review friction is the point. The gate's spec also plants a known
  * violation and asserts the checker fires (the ScaleTrend inject
  * discipline).
  */
object WindowAudit {

  /** Known-bounded VALUE-DOMAIN grains — the ALLOWLIST an Aggregate's
    * grouping must sit inside to bound a relation on its own (round-13
    * advisor flip: the old id-name DENYLIST accepted vocabulary grains
    * like `token`/`word`/`piece`, which grow with the corpus under
    * Heaps' law — the wrong direction for a safety lint). Three
    * families, each bounded by its DOMAIN rather than the data volume:
    * calendar / time-bucket units; fixed buckets, bands and quantized
    * measure histograms (the house histogram-CDF discipline — cents,
    * day-gaps, probe indices: bounded by the measure's range);
    * enumerated types / labels / geographies. `_groupingexpression` is
    * the optimizer's alias for an inlined grouping expression — in
    * this codebase always a calendar truncation (`to_date`,
    * week-floor), accepted with that documented caveat. Entity ids,
    * tokens, shingles, pieces, phrases, and every UNKNOWN name bound
    * nothing — the analysis falls through to the aggregate's child
    * (rank-limit, Limit, or a deeper bounded grain). */
  private val boundedGrainNames = Set(
    // calendar / time buckets
    "d", "day", "dt", "date", "week", "wk", "month", "year", "hour",
    "dow", "t", "lag", "h", "rel_week", "session_window",
    // fixed buckets / bands / quantized-measure histogram cells
    "bucket", "graft_rk_bucket", "bin", "band", "level", "margin",
    "j", "c", "x", "v", "recency", "frequency", "decile", "quintile",
    // "cent" is valid ONLY for quantized-cents histogram grains produced
    // by a groupBy(cent) fold over a price-derived measure (the house
    // histogram-CDF discipline: domain ≤ ~20M distinct cells, in practice
    // ≤100k at any SF because prices cluster). A future column named
    // `cent` that is NOT a quantized measure would pass this name check
    // unbounded — reviewers: check the producing fold, not the name.
    "cent",
    // enumerated types / labels / geographies / bounded path alphabets
    "event_type", "label", "lang", "kind", "status", "arm", "modality",
    "source", "brand", "category", "n_name", "cust_nation",
    "supp_nation", "path",
    // optimizer-inlined grouping expression (calendar truncations)
    "_groupingexpression")

  private def isBoundedGrainName(n: String): Boolean = {
    val s = n.toLowerCase
    boundedGrainNames(s) || s.endsWith("_band") || s.endsWith("_d") ||
      s.endsWith("_type") || s.endsWith("_bucket") || s.endsWith("_bin")
  }

  /** Conservative static cardinality bound for `p` (see object doc). */
  def bounded(p: LogicalPlan): Boolean = p match {
    case _: WindowGroupLimit => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case a: Aggregate =>
      a.groupingExpressions.forall(
        _.references.forall(r => isBoundedGrainName(r.name))) ||
        bounded(a.child)
    case r: Range => r.numElements <= BigInt(65536)
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => bounded(j.left)
      case _ => bounded(j.left) && bounded(j.right)
    }
    case _: LeafNode => false
    case other => other.children.nonEmpty && other.children.forall(bounded)
  }

  /** The empty-partition windows in `plan` whose input has no visible
    * cardinality bound — each plans as a single-task global sort of
    * unbounded data at scale. */
  def unboundedGlobalWindows(plan: LogicalPlan): Seq[Window] =
    plan.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
    }
}
