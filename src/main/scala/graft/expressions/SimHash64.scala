package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array, returned as a 64-char '0'/'1' string.
  *
  * Definition (kept deliberately md5-based so a DuckDB oracle can compute
  * the identical value from `md5(word)` hex nibbles — see SparkEntry's
  * `dedup_simhash` SQL):
  *   - per token: h = first 8 bytes of md5(utf8(token)), bits MSB-first;
  *   - counts[j] += (bit_j(h) == 1) ? +1 : -1 over all tokens;
  *   - simhash bit j = 1 iff counts[j] > 0.
  *
  * A custom Catalyst expression rather than a UDF: evaluates directly on
  * ArrayData/UTF8String with one MessageDigest per partition-row and no
  * Scala-object conversion. CodegenFallback is acceptable here — the md5
  * work dominates, not the eval dispatch; documents-per-second scales with
  * partition count, not driver anything.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (!arr.isNullAt(k)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(k).getBytes)
        var j = 0
        while (j < 64) {
          val bit = (digest(j >> 3) >> (7 - (j & 7))) & 1
          counts(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      k += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < 64) { sb.append(if (counts(j) > 0) '1' else '0'); j += 1 }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
