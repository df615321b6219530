package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = graft.Tables(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("shingle")).cache()
    time("warm_cache")(sh.count())
    val hashes = (0 until 9).map { i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")
    }
    val sigs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), hashes: _*)
    time("sigs")(sigs.count())
    time("sigs_again")(sigs.count())
    val bands = sigs.select(col("doc_id"), col("n"),
      expr("stack(3, 0, concat(h0, ',', h1, ',', h2), 1, " +
        "concat(h3, ',', h4, ',', h5), 2, concat(h6, ',', h7, ',', h8)) as (band, sig)"))
      .select(col("doc_id"), col("n"), col("band"), md5(col("sig")).as("bucket"))
    val cand = bands.as("x")
      .join(bands.as("y"), col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.n").as("n1"), col("y.n").as("n2")).distinct()
    time("cand")(cand.count())
    time("cand_again")(cand.count())
    val fin = cand.join(sh.as("a"), col("d1") === col("a.doc_id"))
      .join(sh.as("b"), col("d2") === col("b.doc_id") && col("a.shingle") === col("b.shingle"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
    time("full")(fin.count())
    time("full_again")(fin.count())
    spark.stop()
  }
}
