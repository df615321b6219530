package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (Catalyst `Generator`): overlapping sliding
  * word-window "passages" of a document — the chunking step every
  * training-data/RAG pipeline runs before embedding or tokenizing. Each
  * input text yields rows `(chunk_idx, chunk_text, n_words)` where chunk
  * `i` covers words `[i*stride, i*stride + size)` of the single-space
  * tokenization (empty tokens kept, same split as [[WordShingles]]).
  * A text with at most `size` words yields exactly one chunk; otherwise
  * `ceil((n - size) / stride) + 1` chunks, so the tail words are always
  * covered and the last chunk may be short. NULL text yields no rows.
  *
  * Why a Generator rather than explode-of-array: the generator streams
  * chunks straight into `GenerateExec` without materializing an
  * intermediate array-of-structs per row — at 100 TB the chunk relation
  * is ~2x the corpus (stride = size/2) and never exists as a column.
  * The reference has no table functions at all (SURVEY.md §2 "UDF/UDTF
  * surface"); this adds the surface Spark-natively.
  */
case class ChunkWords(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(size > 0 && stride > 0 && stride <= size,
    s"need 0 < stride <= size, got size=$size stride=$stride")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_words needs string, got ${t.sql}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      val n = words.length
      val nChunks =
        if (n <= size) 1 else (n - size + stride - 1) / stride + 1
      (0 until nChunks).iterator.map { i =>
        val start = i * stride
        val end = math.min(start + size, n)
        val sb = new java.lang.StringBuilder
        var j = start
        while (j < end) {
          if (j > start) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        InternalRow(i.toLong, UTF8String.fromString(sb.toString),
          (end - start).toLong)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkWords =
    copy(child = newChild)
}
