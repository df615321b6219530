package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import graft.{SparkEntry, SparkSessions}

/** Dev: exchange/broadcast/cartesian census of the top bench queries, to
  * pin plan-shape regression bounds in PlanAuditSpec. */
object ExchangeCounts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = Seq("dedup_clusters_star", "docs_curation_pipeline",
      "dedup_clusters", "text_substring_dup", "dedup_semantic_clusters",
      "text_bigram_logprob", "graph_pagerank", "dedup_keep_best",
      "graph_label_prop", "dedup_incremental_minhash", "dedup_bloom_prefilter",
      "docs_quality_probe", "text_bpe_merges", "text_bpe_encode")
    targets.foreach { name =>
      val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val ex = "Exchange".r.findAllIn(p).size
      val bc = "BroadcastHashJoin".r.findAllIn(p).size
      val cart = "CartesianProduct".r.findAllIn(p).size
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      println(f"$name%-26s exchanges=$ex bhj=$bc smj=$smj cart=$cart bnlj=$bnl")
    }
    spark.stop()
  }
}
