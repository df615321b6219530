package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** [[TextAnalysis.applyFrozenMerges]] is the encode-only half the
  * streaming tokenizer ships; its apply machinery must never drift from
  * the trainer's inlined apply (the kernel-vs-sweep discipline). Pin:
  * replaying the trainer's own merge table over the trainer's own
  * vocabulary must reproduce the trainer's final symbol relation
  * bit-for-bit — same rows, same positions, same merged symbols. */
class BpeFrozenApplySpec extends graft.SparkSpec {

  test("frozen apply over the training vocabulary equals the trainer's " +
    "final symbol relation") {
    val words = TextAnalysis
      .bpeWords(Tables(spark, sf0001, "documents")).localCheckpoint()
    val (mergeTable, trainedSyms, _) =
      TextAnalysis.bpeTrainOnWords(spark, words, rounds = 4)
    val merges = mergeTable.orderBy(col("merge_round"))
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(merges.length === 4)
    // the symbol relation is array-form (w, freq, syms) — explode back
    // to (w, freq, pos, sym) rows so the pin still compares positions
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("w"), col("freq"), explode(col("syms")).as("e"))
        .select(col("w"), col("freq"), col("e.pos"), col("e.sym"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getString(3))).sorted.toSeq
    val frozen = TextAnalysis.applyFrozenMerges(spark, words, merges)
    val a = rows(trainedSyms)
    assert(a.nonEmpty)
    assert(rows(frozen) === a)
  }
}
