package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded MinHash LSH buckets of a shingle set, one pass per document.
  *
  * Definition (identical to the relational form the DuckDB oracle runs —
  * see SparkEntry's `dedup_minhash_lsh` SQL):
  *   - hash_i(doc) = lexicographic MIN over shingles of
  *     md5hex(i || ":" || shingle), i in [0, numHashes);
  *   - bucket_b = md5hex(hash_{3b} || "," || hash_{3b+1} || "," ||
  *     hash_{3b+2}), b in [0, numHashes / bandSize).
  *
  * Returns the bucket array, or NULL for an empty shingle set (so a
  * downstream explode drops shingle-less documents, matching the
  * relational groupBy which never saw them).
  *
  * Why an expression: the relational signature build explodes every
  * document into its shingle rows and runs a 9-buffer string-min hash
  * aggregation — a full shuffle of |shingles| rows. This computes the
  * same signature in the map stage; only (doc_id, bucket) rows ever
  * shuffle. The md5 work is identical; the data movement is not.
  */
case class MinHashBandBuckets(child: Expression, numHashes: Int, bandSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_buckets needs array<string>, got ${t.sql}")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](numHashes)
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val shingle = arr.getUTF8String(k).toString
        var i = 0
        while (i < numHashes) {
          val h = md5Hex(md, i.toString + ":" + shingle)
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      k += 1
    }
    if (mins(0) == null) return null // all-null shingle entries
    val nBands = numHashes / bandSize
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder(33 * bandSize)
      var j = 0
      while (j < bandSize) {
        if (j > 0) sb.append(',')
        sb.append(mins(b * bandSize + j))
        j += 1
      }
      out(b) = UTF8String.fromString(md5Hex(md, sb.toString))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)
}

/** The RAW MinHash signature — hash_i(doc) = lexicographic MIN over
  * shingles of md5hex(i || ":" || shingle), i in [0, numHashes) — without
  * [[MinHashBandBuckets]]'s banding fold. Exists for the LSH banding
  * SWEEP ([[graft.operators.DedupOps.lshBandingSweep]]): computing the
  * signature once and re-banding it relationally (md5 of the
  * comma-joined band slice, the identical bucket definition) lets every
  * (bands x rows) setting share ONE md5-over-shingles corpus pass
  * instead of one per setting. Same null convention: NULL for an empty
  * shingle set. */
case class MinHashValues(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_values needs array<string>, got ${t.sql}")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](numHashes)
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val shingle = arr.getUTF8String(k).toString
        var i = 0
        while (i < numHashes) {
          val h = md5Hex(md, i.toString + ":" + shingle)
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      k += 1
    }
    if (mins(0) == null) return null
    new GenericArrayData(
      mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashValues =
    copy(child = newChild)
}
