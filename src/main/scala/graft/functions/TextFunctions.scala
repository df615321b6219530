package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks (tokenize, shingle, stopword counts) as
  * Column compositions. Every definition here has a 1:1 DuckDB rendering
  * used by the oracle SQL — tokenization is a plain single-space split so
  * both engines agree on edge cases.
  */
object TextFunctions {

  /** whitespace tokenization (single-space split — the corpus is
    * space-joined words, and DuckDB's string_split matches exactly). */
  def tokens(text: Column): Column = split(text, " ")

  /** distinct k-word shingles, 1-based inclusive slices — mirrors the
    * DuckDB list-comprehension `words[i:i+k-1] for i in range(1, len-k+2)`.
    * Docs shorter than k words yield an empty array (not an error). */
  def shingles(text: Column, k: Int = 5): Column = {
    val w = tokens(text)
    when(size(w) >= k,
      array_distinct(transform(
        sequence(lit(1), size(w) - lit(k - 1)),
        i => array_join(slice(w, i, lit(k)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** English-ish stopword list shared verbatim with the oracle SQL. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  private val stopSql = stopwords.map(s => s"'$s'").mkString(", ")

  /** count of stopword tokens (positional, not distinct). */
  def stopwordCount(tokensCol: Column): Column =
    size(filter(tokensCol, t => t.isin(stopwords.map(lit(_)): _*)))
      .cast("long")

  /** token count as BIGINT (DuckDB len() parity). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** distinct-token count (type-token ratio numerator). */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")
}
