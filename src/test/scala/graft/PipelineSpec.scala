package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.{Dedup, Ingest, Pipeline, Sink}
import graft.schema.AppsflyerSchema

/** Golden-fixture ingest + idempotence tests (SURVEY.md §5.3/§5.4):
  * AppsFlyer-shaped CSV with BOM, sentinel nulls, ragged datetimes, an
  * unmapped extra column, empty keys, and within-batch duplicates. */
class PipelineSpec extends SparkSpec {

  private lazy val fixtureCsv: String = {
    val dir = Files.createTempDirectory("graft-fixture").toFile
    val f = new java.io.File(dir, "installs.csv")
    val header = "﻿Attributed Touch Type,Install Time,Event Time," +
      "Media Source,AppsFlyer ID,Campaign ID,gp_referrer"
    val rows = Seq(
      // clean row
      "click,2024-01-15 10:15:00,2024-01-15 10:16:00,ms1,id1,c1,DROPME",
      // fractional seconds + 1-digit hour + sentinel string
      "click,2024-01-15 3:04:05.000,2024-01-15 10:16:00,null,id2,c2,x",
      // malformed datetime -> NULL; 'None' string -> NULL
      "impression,26/01/2024 10:15,n/a,None,id3,c3,y",
      // empty key -> dropped before sink
      "click,2024-01-15 11:00:00,2024-01-15 11:00:30,ms2,,c4,z",
      // duplicate key within batch -> BOTH kept (reference main.py never
      // dedups within a batch)
      "click,2024-01-15 12:00:00,2024-01-15 12:00:30,ms3,dup1,c5,w",
      "click,2024-01-15 12:05:00,2024-01-15 12:05:30,ms3,dup1,c5,w"
    )
    Files.writeString(f.toPath, (header +: rows).mkString("\n"))
    f.getAbsolutePath
  }

  test("golden ingest: BOM, projection, rename, normalize") {
    val df = Ingest.ingestCsv(spark, fixtureCsv)
    assert(df.columns.toSeq === AppsflyerSchema.sinkColumns)
    assert(!df.columns.contains("gp_referrer"), "unmapped columns dropped")
    val r1 = df.filter(col("appsflyer_id") === "id1").head
    assert(r1.getAs[java.sql.Timestamp]("install_time") ===
      java.sql.Timestamp.valueOf("2024-01-15 10:15:00"))
    assert(r1.getAs[String]("campaignid") === "c1")
    val r2 = df.filter(col("appsflyer_id") === "id2").head
    assert(r2.getAs[java.sql.Timestamp]("install_time") ===
      java.sql.Timestamp.valueOf("2024-01-15 03:04:05"))
    assert(r2.getAs[String]("media_source") === null, "sentinel 'null' -> NULL")
    val r3 = df.filter(col("appsflyer_id") === "id3").head
    assert(r3.getAs[java.sql.Timestamp]("install_time") === null, "malformed -> NULL")
    assert(r3.getAs[java.sql.Timestamp]("event_time") === null, "'n/a' -> NULL")
    assert(r3.getAs[String]("media_source") === null, "'None' -> NULL")
  }

  test("idempotence: second overlapping run inserts nothing (J1)") {
    val sink = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath + "/t"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      AppsflyerSchema.sinkSchema)
    val (from, to) = ("2024-01-15 00:00:00", "2024-01-15 23:59:59")
    val n1 = Pipeline.run(spark, fixtureCsv, sink, empty, from, to)
    // 4 valid-key rows in window: id1, id2, dup1 x2 (id3 has NULL
    // install_time -> fails window predicate; empty key dropped)
    assert(n1 === 4)
    val existing = spark.read.parquet(sink)
    val n2 = Pipeline.run(spark, fixtureCsv, sink, existing, from, to)
    assert(n2 === 0, "cross-run dedup")
    assert(spark.read.parquet(sink).count() === 4)
    // within-batch duplicates were BOTH kept on the first run
    assert(spark.read.parquet(sink)
      .filter(col("appsflyer_id") === "dup1").count() === 2)
  }

  test("empty source -> empty run, no exception (main.py:136-138)") {
    val dir = Files.createTempDirectory("graft-empty").toFile
    val f = new java.io.File(dir, "empty.csv")
    Files.writeString(f.toPath, "Attributed Touch Type,AppsFlyer ID\n")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      AppsflyerSchema.sinkSchema)
    val sink = Files.createTempDirectory("graft-sink2").toFile.getAbsolutePath + "/t"
    val n = Pipeline.run(spark, f.getAbsolutePath, sink, empty,
      "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(n === 0)
  }

  test("anti-join keeps probe-side duplicates, drops invalid keys") {
    import spark.implicits._
    val batch = Seq(("a", 1), ("a", 2), ("b", 3), ("", 4),
      (null.asInstanceOf[String], 5)).toDF("k", "v")
    val existing = Seq("b").toDF("k")
    val out = Dedup.newRows(batch, existing, "k")
      .orderBy("v").as[(String, Int)].collect()
    assert(out.toSeq === Seq(("a", 1), ("a", 2)))
  }

  test("compact rewrites many small files into the byte-budgeted count") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_compact_src").toString
    val dest = src + "_out"
    // 40 tiny files
    spark.range(40000).select(col("id"), (col("id") % 7).as("g"))
      .repartition(40).write.mode("overwrite").parquet(src)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(before == 40)
    // generous per-file budget -> everything fits in one file
    val after = Sink.compact(spark, src, dest, targetFileBytes = 1L << 30)
    assert(after == 1, s"expected 1 compacted file, got $after")
    // content preserved exactly
    val a = spark.read.parquet(src).orderBy("id").as[(Long, Long)].collect()
    val b = spark.read.parquet(dest).orderBy("id").as[(Long, Long)].collect()
    assert(a.toSeq == b.toSeq)
  }
}
