package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array, returned as a LONG (two's-complement;
  * long bit `63 - j` equals character `j` of [[SimHash64]]'s bit string,
  * i.e. the string read MSB-first). Same md5-per-token majority vote as
  * [[SimHash64]] — a DuckDB oracle reproduces the bits from `md5(token)`
  * hex nibbles — but the long form keeps downstream distance work inside
  * whole-stage codegen: banding is `shiftright` + mask and Hamming
  * distance is `bit_count(a ^ b)`, instead of per-row substring loops
  * over a 64-char string.
  *
  * CodegenFallback for the hash itself is fine (md5 dominates); what must
  * NOT fall back is the O(candidate-pairs) distance arithmetic, which
  * this type makes native. */
case class SimHash64Long(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64_long needs array<string>, got ${t.sql}")
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
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= 1L << (63 - j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64Long = copy(child = newChild)
}
