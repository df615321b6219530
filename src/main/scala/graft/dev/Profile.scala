package graft.dev
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // corr variant A: current decimal(18,6) casts
    def corrA = graft.operators.Relational.corrPriceQty(spark, dir)
    // corr variant B: exact long-cents products; sxx via decimal(28,0) sum
    def corrB = {
      val li = graft.Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("pc"),
          round(col("l_quantity")).cast("long").as("q"))
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          (sum(col("pc")).cast("double") / 100).as("sx"),
          sum(col("q")).cast("double").as("sy"),
          (sum(col("pc") * col("q")).cast("double") / 100).as("sxy"),
          ((sum((col("pc") * col("pc")).cast("decimal(28,0)"))).cast("double") / 10000).as("sxx"),
          sum(col("q") * col("q")).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_price_qty"))
        .orderBy(col("l_returnflag"))
    }
    // corr variant C: current + repartition to parallelize past 1 rowgroup
    def corrC = {
      val d = (c: Column) => c.cast("decimal(18,6)")
      graft.Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
        .repartition(32)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(d(col("l_extendedprice"))).cast("double").as("sx"),
          sum(d(col("l_quantity"))).cast("double").as("sy"),
          sum(d(col("l_extendedprice") * col("l_quantity"))).cast("double").as("sxy"),
          sum(d(col("l_extendedprice") * col("l_extendedprice"))).cast("double").as("sxx"),
          sum(d(col("l_quantity") * col("l_quantity"))).cast("double").as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_price_qty"))
        .orderBy(col("l_returnflag"))
    }

    time("warmup")(noop(spark.read.parquet(s"$dir/part.parquet")))
    time("corr_warm")(noop(corrA))
    for (i <- 1 to 3) {
      time(s"corrA_$i")(noop(corrA))
      time(s"corrB_$i")(noop(corrB))
      time(s"corrC_$i")(noop(corrC))
    }
    corrA.show(false)
    corrB.show(false)
    spark.stop()
  }
}
