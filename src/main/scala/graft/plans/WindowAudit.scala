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

  /** Entity-identifier shaped column names: grouping by one scales
    * with the data (users, documents, vectors, orders, customers…) and
    * therefore does NOT bound a relation. `k`/`grp` cover the islands
    * idiom's key aliases. */
  private def isIdName(n: String): Boolean = {
    val s = n.toLowerCase
    s == "k" || s == "grp" || s.endsWith("_id") || s.endsWith("key")
  }

  /** Conservative static cardinality bound for `p` (see object doc). */
  def bounded(p: LogicalPlan): Boolean = p match {
    case _: WindowGroupLimit => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case a: Aggregate =>
      a.groupingExpressions.forall(
        _.references.forall(r => !isIdName(r.name))) || bounded(a.child)
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
