package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.operators.TextAnalysis

/** Round-8 operators: paragraph-level exact dedup — golden recomputation
  * against a from-scratch driver-side model, plus the plan-shape pin
  * (one posting shuffle, no self-join). */
class Round8OpsSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("text_paragraph_dedup equals a driver-side first-occurrence model") {
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // paragraphs: non-overlapping 15-word chunks, last one short — the
    // same segmentation ChunkWords(size = stride = 15) produces
    val paras = docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).grouped(15).zipWithIndex.map {
        case (ws, i) => (id, src, i.toLong, ws.mkString(" "), ws.length.toLong)
      }
    }
    // first global occurrence of each paragraph text wins, ordered by
    // (doc_id, paragraph index) — matches the row_number window
    val seen = scala.collection.mutable.HashSet[String]()
    val flagged = paras.sortBy(p => (p._1, p._3)).map { p =>
      (p, seen.add(p._4)) // true iff first occurrence
    }
    val expect = flagged.groupBy(_._1._2).toSeq.sortBy(_._1).map {
      case (src, xs) =>
        val total = xs.map(_._1._5).sum
        val kept = xs.filter(_._2).map(_._1._5).sum
        (src, xs.map(_._1._1).distinct.length.toLong, xs.length.toLong,
          xs.count(_._2).toLong, total, kept,
          round6(1.0 - kept.toDouble / total.toDouble))
    }
    val got = TextAnalysis.paragraphDedup(spark, sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expect)
    // the corpus plants exact duplicates, so cross-doc paragraph dups
    // must exist — a vacuously-zero removed mass would hide a broken join
    assert(expect.map(_._4).sum < expect.map(_._3).sum,
      "expected at least one removed duplicate paragraph in the corpus")
  }

  test("text_paragraph_dedup plan: one posting shuffle, no self-join, " +
    "chunks stream from the generator") {
    val p = plan(TextAnalysis.paragraphDedup(spark, sf0001))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"),
      "first-occurrence ranking must be a window over the fingerprint, " +
        "not a keeper join back to the paragraph relation")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      "one corpus scan feeds the chunk generator")
    assert("hashpartitioning\\(fp".r.findAllIn(p).size == 1,
      "exactly one exchange carries the paragraph fingerprint window")
    assert(p.contains("Generate"), "paragraphs must stream out of " +
      "ChunkWords via GenerateExec, not materialize as an array column")
  }
}
