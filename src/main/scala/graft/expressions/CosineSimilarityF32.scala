package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Cosine similarity of two float32 vectors with STRICT sequential float32
  * accumulation: dot/(sqrt(n1)*sqrt(n2)), every multiply/add/divide in
  * Float. This is bit-identical to DuckDB's `list_cosine_similarity` over
  * FLOAT lists (verified empirically), so oracle comparisons and threshold
  * filters agree exactly — no epsilon anywhere.
  *
  * Implements `doGenCode` (a tight primitive loop over ArrayData, no
  * boxing, fused into WholeStageCodegen) — this is the hot inner kernel of
  * brute-force and candidate-verification similarity search, executed
  * O(pairs x dims) times.
  */
case class CosineSimilarityF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_f32 needs (array<float>, array<float>), got (${l.sql}, ${r.sql})")
    }

  // null vector elements contribute 0 (skipped); the branch is only
  // emitted when the schema admits null elements
  private lazy val anyElemNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0f; var nx = 0f; var ny = 0f
    var i = 0
    while (i < n) {
      val xv = if (anyElemNullable && x.isNullAt(i)) 0f else x.getFloat(i)
      val yv = if (anyElemNullable && y.isNullAt(i)) 0f else y.getFloat(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx.toDouble).toFloat * math.sqrt(ny.toDouble).toFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = if (anyElemNullable) s"($x.isNullAt($i) ? 0f : $x.getFloat($i))"
                 else s"$x.getFloat($i)"
      val getY = if (anyElemNullable) s"($y.isNullAt($i) ? 0f : $y.getFloat($i))"
                 else s"$y.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |float $dot = 0f, $nx = 0f, $ny = 0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $xv = $getX;
         |  float $yv = $getY;
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / ((float) java.lang.Math.sqrt((double) $nx)
         |  * (float) java.lang.Math.sqrt((double) $ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityF32 =
    copy(left = newLeft, right = newRight)
}
