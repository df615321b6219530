package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a single-space-tokenized text, one pass.
  *
  * Semantics are identical to the Column composition
  * [[graft.functions.TextFunctions.shingles]] (single-space split keeping
  * empty tokens, 1-based inclusive k-slices joined by ' ', first-occurrence
  * distinct, docs shorter than k words yield an empty array) and to the
  * DuckDB list-comprehension the oracle uses — asserted equal in
  * TextDedupSpec.
  *
  * Why an expression: the composed form nests four interpreted
  * higher-order functions (sequence/transform/slice/array_join) that
  * allocate per shingle; this walks the text once with plain JVM string
  * ops. Shingling sits under every near-dup operator, so its per-document
  * cost is the dominant map-side term of the 100 TB dedup plan.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs string, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    // limit -1: keep trailing empty tokens, matching split(text, ' ') and
    // DuckDB string_split
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length
    if (n < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](n * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= n - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var p = 0
      while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
