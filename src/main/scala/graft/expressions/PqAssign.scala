package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization code assignment: for each of the codebook's M
  * subspaces, the 0-based POSITION of the L2-nearest codeword of the
  * row's corresponding sub-vector. `left` = the embedding
  * (`array<float>`, dim = M * subDim), `right` = the codebook
  * (`array<array<array<float>>>`: per subspace, a list of subDim-wide
  * codewords — in practice one broadcast-joined column). Returns
  * `array<int>` of length M.
  *
  * Semantics are EXACTLY the HOF rendering it replaces (and that
  * PqSpec pins it against):
  * `array_min(transform(cb[m], (cw, i) -> struct(aggregate(zip_with(
  *   sub, cw, (x, y) -> double(x) - double(y)), 0d, (a, v) -> a + v*v)
  *   AS d, i AS cid))).cid`
  * — differences taken in double, squares accumulated sequentially in
  * double in dimension order, ties broken to the smallest position
  * (strict `<` keeps the first minimum). Deterministic under any
  * partitioning, so training and encode agree across runs and engines.
  *
  * Why an expression: the HOF form interprets M x K x subDim lambda
  * steps per row with boxed structs (measured ~4x the whole query's
  * runtime at sf0.1 — the encode dominated sim_pq_adc at 12.7s); this
  * is the same arithmetic as primitive JVM loops. It sits once in the
  * training passes and once in the encode map, the two places the
  * corpus is actually touched.
  */
case class PqAssign(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_assign needs (array<float>, array<array<array<float>>>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val m = cb.numElements()
    // UnsafeArrayData.getFloat past the end is NOT bounds-checked, so a
    // dim mismatch would read silently-garbage bytes instead of failing.
    // Validate the shape up front: every codeword in a subspace must be
    // codeword-0's width, and the widths must tile the embedding exactly.
    var expected = 0
    var vi = 0
    while (vi < m) {
      val cws = cb.getArray(vi)
      if (cws.numElements() == 0) throw new IllegalStateException(
        s"pq_assign: subspace $vi has an empty codebook — training must " +
          "leave at least one codeword per subspace")
      expected += cws.getArray(0).numElements()
      vi += 1
    }
    if (emb.numElements() != expected) throw new IllegalArgumentException(
      s"pq_assign: embedding has ${emb.numElements()} dims but the " +
        s"codebook's $m subspaces cover $expected")
    val codes = new Array[Int](m)
    var mi = 0
    var off = 0 // running start of subspace mi within the embedding
    while (mi < m) {
      val cws = cb.getArray(mi)
      val k = cws.numElements()
      val width = cws.getArray(0).numElements()
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val cw = cws.getArray(ki)
        if (cw.numElements() != width) throw new IllegalArgumentException(
          s"pq_assign: subspace $mi codeword $ki has ${cw.numElements()} " +
            s"dims, expected $width — ragged codebooks would misalign " +
            "every later subspace")
        var d = 0.0
        var si = 0
        while (si < width) {
          val v = emb.getFloat(off + si).toDouble - cw.getFloat(si).toDouble
          d += v * v
          si += 1
        }
        if (d < bestD) { bestD = d; best = ki } // strict < : ties keep
        ki += 1                                 // the smallest position
      }
      codes(mi) = best
      off += width
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override def prettyName: String = "pq_assign"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
