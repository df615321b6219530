package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-10 operators and guards. */
class Round10OpsSpec extends SparkSpec {

  test("bpeMergeLearn fails fast, naming the condition, when the corpus " +
    "exhausts its learnable merges before `rounds`") {
    import spark.implicits._
    // a single 1-letter word: round 1 merges (a, </w>); round 2 has no
    // adjacent pairs left anywhere
    val dir = Files.createTempDirectory("graft_bpe_tiny").toString
    Seq(("a a a", 1L)).toDF("text", "doc_id")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeMergeLearn(spark, dir, rounds = 3).collect()
    }
    assert(e.getMessage.contains("no adjacent pairs left at round 2"))
    assert(e.getMessage.contains("supports only 1 merges"))
  }
}
