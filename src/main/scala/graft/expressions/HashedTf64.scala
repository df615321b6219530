package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bucket hashed bag-of-words term-frequency vector of a token array:
  * bucket(word) = (first md5 byte of the word) mod 64, one count per
  * occurrence — exactly the feature-hashing scheme the DuckDB oracle
  * renders relationally as
  * `(nibble(md5,1)*16 + nibble(md5,2)) % 64` (see SparkEntry's
  * `dedup_embedding_cosine` SQL), folded into one pass per document.
  *
  * Replaces an explode-per-token + hash + groupBy(doc, bucket) build —
  * i.e. a shuffle of every token occurrence — with a map-side walk;
  * downstream cosine math then runs per-row on the dense vector.
  */
case class HashedTf64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_tf64 needs array<string>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Long](64)
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (!arr.isNullAt(k)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(k).getBytes)
        counts((digest(0) & 0xff) % 64) += 1
      }
      k += 1
    }
    new GenericArrayData(counts.map(Long.box).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): HashedTf64 =
    copy(child = newChild)
}
