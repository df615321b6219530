package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH bucket strings for a float32 embedding vector:
  * `nPlanes` signed projections, banded into `nPlanes / bandSize` buckets
  * of `bandSize` sign bits each ('1' iff the projection is > 0).
  *
  * The ±1 plane matrix is deterministic — sign(j, d) = +1 iff the first
  * md5-hex nibble of "j:d" (d 1-based) is odd — so a DuckDB oracle can
  * reproduce every bit from `md5(j || ':' || d)` (see SparkEntry's
  * `sim_ann_lsh` SQL). Projections accumulate in double in fixed d-order,
  * so the result is bit-deterministic under any partitioning; it can only
  * diverge from the oracle's exact-DECIMAL sum if a projection lands
  * within float-rounding distance of exactly 0, which the oracle harness
  * verifies does not happen on the test corpus.
  *
  * One narrow per-row map — no explode, no join, no shuffle; 2048 fused
  * multiply-adds per row replace what a relational formulation spends two
  * shuffled aggregations on. The plane matrix is built once per executor
  * (lazily, per observed dimensionality) and reused across rows.
  */
case class HyperplaneLshBuckets(child: Expression, nPlanes: Int, bandSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_lsh needs array<float>, got ${t.sql}")
    }
  }

  // null vector elements contribute 0 to every projection; the branch is
  // only emitted when the schema admits null elements
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  // plane matrix cache, rebuilt only if the vector dimensionality changes
  @transient private var signCache: Array[Array[Byte]] = _
  @transient private var signDim: Int = -1

  private def signs(dim: Int): Array[Array[Byte]] = {
    if (signDim != dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      signCache = Array.tabulate(nPlanes) { j =>
        Array.tabulate(dim) { d0 =>
          md.reset()
          val digest = md.digest(s"$j:${d0 + 1}".getBytes("UTF-8"))
          (if (((digest(0) >> 4) & 0xf) % 2 == 1) 1 else -1).toByte
        }
      }
      signDim = dim
    }
    signCache
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val s = signs(dim)
    val nBands = nPlanes / bandSize
    val out = new Array[UTF8String](nBands)
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder(bandSize)
      var i = 0
      while (i < bandSize) {
        val row = s(b * bandSize + i)
        var p = 0.0
        var d = 0
        while (d < dim) {
          if (!elemNullable || !arr.isNullAt(d))
            p += row(d) * arr.getFloat(d).toDouble
          d += 1
        }
        sb.append(if (p > 0) '1' else '0')
        i += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneLshBuckets = copy(child = newChild)
}
