package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation function (the `Aggregator[IN, BUF, OUT]`
  * surface — the reference has no aggregates at all, SURVEY.md §2): exact
  * top-k (value, id) pairs per group WITHOUT a per-group sort.
  *
  * Scale shape: the buffer is a bounded k-element list, `reduce` folds one
  * row in O(k), and `merge` is associative/commutative — so Spark runs it
  * as a map-side partial aggregate and only k-row buffers ever shuffle,
  * the same partial-agg contract built-in min/max enjoy. A window-rank
  * formulation of the same query shuffles EVERY row of the group; this
  * shuffles k per partition. Ties break on ascending id, making the
  * result deterministic under any partitioning.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // descending value, ascending id on ties
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
                      row: (Double, Long)): List[(Double, Long)] =
    insert(buf, row)

  override def merge(a: List[(Double, Long)],
                     b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(Double, Long)],
                     row: (Double, Long)): List[(Double, Long)] = {
    val (before, after) = buf.span(lt(_, row))
    val merged = before ::: row :: after
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
