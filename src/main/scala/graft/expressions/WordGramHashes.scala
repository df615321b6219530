package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass word hashing for the positional-gram operators.
  *
  * Both expressions below tokenize on single spaces (limit -1, matching
  * `split(text, ' ')` and DuckDB `string_split`), hash every word ONCE
  * with Spark's own xxhash64 (seed 42 — bit-identical to the `xxhash64`
  * SQL function on the same word), and combine word hashes into window
  * fingerprints with a degree-(k-1) polynomial in an odd 64-bit constant,
  * evaluated by a rolling update — O(tokens), never O(tokens*k).
  *
  * The fingerprints are equality-only keys (posting lists, count maps):
  * any injective-w.h.p. mapping yields identical downstream counts, so
  * none of the consumers needs the gram TEXT the previous formulation
  * built per window (k-1 string appends + an alloc per window, through
  * four interpreted higher-order functions). The DuckDB oracles keep
  * grouping raw gram text and agree because both engines only test
  * equality. Collision odds for a 64-bit polynomial over xxhash64 words
  * at 1e9 windows are ~1e-19 per pair; a 100 TB deployment would move to
  * a seeded 128-bit scheme, same shape.
  */
private[expressions] object GramHash {
  final val P = 0x9e3779b97f4a7c15L // odd => multiplication is a bijection

  def wordHashes(input: Any): Array[Long] = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = XxHash64Function.hash(
        UTF8String.fromString(words(i)), StringType, 42L)
      i += 1
    }
    out
  }
}

/** Positional k-gram fingerprints of a text, as `array<bigint>` — the
  * hashed-long replacement for `explode(grams(text,k))` + `xxhash64(g)`
  * (TextAnalysis.grams): every occurrence kept, one entry per window
  * start, docs shorter than k words yield an empty array. */
case class WordGramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "window length must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_hashes needs string, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    import GramHash.P
    val wh = GramHash.wordHashes(input)
    val n = wh.length
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      // pk = P^(k-1) for the rolling subtract of the departing word
      var pk = 1L
      var j = 0
      while (j < k - 1) { pk *= P; j += 1 }
      val out = new Array[Long](n - k + 1)
      var h = 0L
      j = 0
      while (j < k) { h = h * P + wh(j); j += 1 }
      out(0) = h
      var i = 1
      while (i <= n - k) {
        h = (h - wh(i - 1) * pk) * P + wh(i + k - 1)
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

/** Positional bigram fingerprints WITH the leading word's hash, as
  * `array<struct<gb:bigint, h1:bigint>>` — the map-side relation of the
  * conditional bigram LM: `gb` keys the bigram-count model, `h1` keys the
  * unigram-count model of the conditioning word, and `h1` is bit-identical
  * to `xxhash64(word)` so the probe can join a model built with the plain
  * SQL function. Replaces grams(2) + xxhash64(g) + xxhash64(
  * substring_index(g,' ',1)), which re-split every bigram string. */
case class BigramHashPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gb", LongType, nullable = false),
      StructField("h1", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_hash_pairs needs string, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    import GramHash.P
    val wh = GramHash.wordHashes(input)
    val n = wh.length
    if (n < 2) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        out(i) = InternalRow(wh(i) * P + wh(i + 1), wh(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BigramHashPairs =
    copy(child = newChild)
}
