package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{CompletedSession, SessionEvent, Sessionize, StreamingOps}

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarkedDedup drops re-sent ids across micro-batches") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(Long, Timestamp)](s)
    val deduped = StreamingOps.watermarkedDedup(
      in.toDF().toDF("id", "ts"), "id", "ts", "2 hours")
    val name = "dedup_sink"
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch 1: ids 1,2 (+ an in-batch duplicate of 1)
      in.addData((1L, ts("2024-01-15 00:10:00")), (2L, ts("2024-01-15 00:20:00")),
        (1L, ts("2024-01-15 00:30:00")))
      q.processAllAvailable()
      // batch 2: id 1 re-sent inside the watermark window + new id 3
      in.addData((1L, ts("2024-01-15 01:10:00")), (3L, ts("2024-01-15 01:20:00")))
      q.processAllAvailable()
      val ids = spark.table(name).select("id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize: intra-batch gap splits, timeout closes the last session") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[SessionEvent](s)
    val name = "sessions_sink"
    val q = Sessionize.sessions(in.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 7: two events 10 min apart, then a 2-hour gap, then one more
      in.addData(
        SessionEvent(7L, ts("2024-01-15 00:00:00"), 1L),
        SessionEvent(7L, ts("2024-01-15 00:10:00"), 2L),
        SessionEvent(7L, ts("2024-01-15 02:10:00"), 3L))
      q.processAllAvailable()
      // advance the watermark far past session 2's end + gap so the
      // EventTimeTimeout fires for user 7's open session
      in.addData(SessionEvent(9L, ts("2024-01-15 06:00:00"), 4L))
      q.processAllAvailable()
      in.addData(SessionEvent(9L, ts("2024-01-15 09:00:00"), 5L))
      q.processAllAvailable()
      val got = spark.table(name).as[CompletedSession].collect()
        .filter(_.user_id == 7L).sortBy(_.session_start.getTime)
      assert(got.length == 2)
      assert(got(0).n_events == 2 &&
        got(0).session_start == ts("2024-01-15 00:00:00") &&
        got(0).session_end == ts("2024-01-15 00:10:00"))
      assert(got(1).n_events == 1 &&
        got(1).session_start == ts("2024-01-15 02:10:00"))
    } finally q.stop()
  }

  test("sessionize agrees with the batch lag/cumsum formulation on sf0.001") {
    val s = spark
    import s.implicits._
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id")).as[SessionEvent]
    val in = MemoryStream[SessionEvent](s)
    val name = "sessions_batch_eq"
    val q = Sessionize.sessions(in.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(ev.collect().toSeq)
      q.processAllAvailable()
      // close every still-open session by advancing event time far ahead
      in.addData(SessionEvent(-1L, ts("2099-01-01 00:00:00"), -1L))
      q.processAllAvailable()
      val streamed = spark.table(name).as[CompletedSession]
        .filter(col("user_id") =!= -1L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      val batch = graft.operators.EventAnalytics.sessionize(spark, sf0001)
      assert(streamed.join(batch.withColumnRenamed("n_sessions", "b_sessions")
          .withColumnRenamed("n_events", "b_events"), "user_id")
        .filter(col("n_sessions") =!= col("b_sessions") ||
          col("n_events") =!= col("b_events")).count() == 0)
      assert(streamed.count() == batch.count())
    } finally q.stop()
  }

  test("incrementalParquetSink appends each micro-batch once") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(Long, String)](s)
    val out = Files.createTempDirectory("graft_sink").toString + "/data"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q = StreamingOps.incrementalParquetSink(
      in.toDF().toDF("id", "v"), out, ckpt)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 3)
    } finally q.stop()
  }

  test("checkpoint resume: a restarted query processes only new files, exactly once") {
    val s = spark
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft_resume_src").toString
    val outDir = Files.createTempDirectory("graft_resume_out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft_resume_ckpt").toString
    def writeBatch(ids: Range, tag: String): Unit =
      ids.map(i => (i.toLong, tag)).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val in = s.readStream
        .schema("id LONG, tag STRING")
        .parquet(srcDir)
      val q = StreamingOps.incrementalParquetSink(in, outDir, ckpt)
      try {
        // AvailableNow semantics via the sink helper: drain what exists
        q.processAllAvailable()
      } finally q.stop()
    }
    writeBatch(0 until 5, "first")
    runOnce()
    assert(spark.read.parquet(outDir).count() == 5)
    writeBatch(5 until 8, "second")
    runOnce() // NEW query instance, same checkpoint: resumes from offsets
    val out = spark.read.parquet(outDir).as[(Long, String)].collect().sorted
    // exactly once: the first file was not reprocessed on restart
    assert(out.length == 8, s"expected 8 rows, got ${out.length}")
    assert(out.map(_._1).toSeq == (0L until 8L))
  }

  test("update output mode re-emits only changed groups per micro-batch") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(String, Long)](s)
    val counts = in.toDF().toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    val name = "update_sink"
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      in.addData(("a", 1L), ("a", 2L), ("b", 1L))
      q.processAllAvailable()
      val batch1 = spark.table(name).as[(String, Long)].collect().toSet
      assert(batch1 == Set(("a", 2L), ("b", 1L)))
      // only 'a' changes; update mode must not re-emit 'b'
      in.addData(("a", 3L))
      q.processAllAvailable()
      val all = spark.table(name).as[(String, Long)].collect().toSeq
      assert(all.count(_ == ("a", 3L)) == 1, "updated 'a' row emitted")
      assert(all.count(_._1 == "b") == 1, "'b' unchanged, not re-emitted")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window views") {
    val s = spark
    import s.implicits._
    val views = MemoryStream[(Long, Timestamp)](s)
    val purchases = MemoryStream[(Long, Timestamp, Long)](s)
    val joined = StreamingOps.streamStreamAttribution(
      views.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "event_id"))
    val name = "ss_join_sink"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-15 10:00:00")),  // in window for purchase @10:20
        (1L, ts("2024-01-15 09:40:00")),  // 40 min before -> outside 30-min window
        (2L, ts("2024-01-15 10:05:00")))  // other user
      purchases.addData((1L, ts("2024-01-15 10:20:00"), 100L))
      q.processAllAvailable()
      // advance both watermarks so results flush
      views.addData((9L, ts("2024-01-15 13:00:00")))
      purchases.addData((9L, ts("2024-01-15 13:00:00"), 999L))
      q.processAllAvailable()
      val got = spark.table(name)
        .filter(col("purchase_id") === 100L)
        .select("view_ts").as[Timestamp].collect().toSeq
      assert(got == Seq(ts("2024-01-15 10:00:00")),
        s"only the in-window same-user view should join, got $got")
    } finally q.stop()
  }

  test("end-to-end streaming installs pipeline: normalize, dedup, idempotent sink") {
    import graft.etl.{Dedup, Ingest}
    val srcDir = Files.createTempDirectory("af_stream_src").toString
    val fixture = getClass.getResourceAsStream("/appsflyer_installs.csv").readAllBytes()
    Files.write(java.nio.file.Paths.get(srcDir, "batch1.csv"), fixture)
    // file streaming sources need an explicit schema; probe it from a batch read
    val schema = spark.read.option("header", true).csv(srcDir).schema
    val raw = spark.readStream.schema(schema).option("header", true)
      .option("maxFilesPerTrigger", 1).csv(srcDir)
    val deduped = StreamingOps.watermarkedDedup(
      Ingest.normalize(raw)
        .filter(Dedup.validKey(col("appsflyer_id")) && col("install_time").isNotNull),
      "appsflyer_id", "install_time", "2 hours")
    val out = Files.createTempDirectory("af_stream_out").toString + "/installs"
    val ckpt = Files.createTempDirectory("af_stream_ckpt").toString
    val q = StreamingOps.incrementalParquetSink(deduped, out, ckpt)
    try {
      q.processAllAvailable()
      val ids1 = spark.read.parquet(out).select("appsflyer_id")
        .collect().map(_.getString(0)).sorted
      // id-1 twice in the batch -> once; '' key and null install dropped
      assert(ids1.toSeq == Seq("id-1", "id-2", "id-3", "id-5"))
      // redeliver the identical window (the reference's overlapping 2-hour
      // pull): every id is inside the watermark horizon -> nothing appended
      Files.write(java.nio.file.Paths.get(srcDir, "batch2.csv"), fixture)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 4)
    } finally q.stop()
  }

  test("streaming tumbling agg equals the batch answer on sf0.001") {
    val streamed = graft.operators.StreamingAnalytics
      .streamTumblingHourly(spark, sf0001).collect()
    val batch = graft.operators.EventAnalytics
      .tumblingHourly(spark, sf0001).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("docs-prep sink probe: prefix predicate prunes partitions — probe " +
    "cost tracks batch size, not sink size") {
    val sink = Files.createTempDirectory("graft_probe").toString + "/kept"
    // a sink shaped exactly like streamDocsPrep's writes: partitioned by
    // the 1-hex-char fingerprint prefix
    spark.range(0, 512)
      .select(md5(col("id").cast("string")).as("fp"), col("id").as("n_tok"))
      .select(col("fp"), substring(col("fp"), 1, 1).as("fp_pfx"), col("n_tok"))
      .write.partitionBy("fp_pfx").parquet(sink)
    val probe = graft.operators.StreamingAnalytics
      .sinkProbe(spark, sink, Seq("0", "f"))
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("fp_pfx"),
      s"prefix predicate must prune sink partitions, got:\n$p")
    // pruning must not lose rows: the probe returns exactly the sink rows
    // under the requested prefixes
    val want = spark.read.parquet(sink)
      .where(substring(col("fp"), 1, 1).isin("0", "f")).count()
    assert(probe.count() == want && want > 0)
    // only the requested partitions' files are read
    val scanned = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("fp_pfx=1") || want == 0)
    // missing sink -> empty single-column relation (first-batch contract)
    assert(graft.operators.StreamingAnalytics
      .sinkProbe(spark, sink + "_nope", Seq("0")).count() == 0)
  }

  test("signature-index maintenance: twice-run stream equals the batch " +
    "increment query — replay appends nothing and re-matches nothing") {
    // streamSignatureIndex internally runs the stream TWICE with fresh
    // checkpoints; equality with the one-increment batch answer therefore
    // proves both the match path and the replay skip (a second run that
    // re-appended signatures would self-match every batch doc at
    // jaccard 1.0 and double the emitted rows)
    val streamed = graft.operators.StreamingAnalytics
      .streamSignatureIndex(spark, sf0001).collect()
    val batch = graft.operators.DedupOps
      .minhashIncrementalDedup(spark, sf0001).collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty, "the corpus plants cross-half near-dups")
  }

  test("multi-increment signature index: increment 2 dedups against " +
    "increment 1's appended signatures, not just the corpus") {
    import org.apache.spark.sql.functions.{col, substring}
    val multi = graft.operators.StreamingAnalytics
      .streamSignatureIndexMulti(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val single = graft.operators.DedupOps
      .minhashIncrementalDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sn = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        substring(col("source"), 4, 8).cast("int").as("sn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the growing index must surface at least one CROSS-INCREMENT match:
    // a doc from increment 2 (sn >= 15) whose best match is an increment-1
    // doc (10 <= sn < 15) — impossible in the single-increment query,
    // where the index side is only ever the corpus (sn < 10)
    val crossIncrement = multi.filter { case (bd, cd) =>
      sn(bd) >= 15 && sn(cd) >= 10 && sn(cd) < 15 }
    assert(crossIncrement.nonEmpty,
      "corpus plants no cross-increment near-dups? multi degenerates to single")
    assert(single.forall { case (_, cd) => sn(cd) < 10 })
    // increment-1 docs see exactly the corpus index, so their rows agree
    // with the single-increment query's
    val multiInc1 = multi.filter { case (bd, _) => sn(bd) < 15 }
    val singleInc1 = single.filter { case (bd, _) => sn(bd) < 15 }
    assert(multiInc1.toSet == singleInc1.toSet)
  }

  test("watermark late-data policy: deep-late dropped, within-watermark " +
    "late kept, expiry judged by the PREVIOUS batch's watermark") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[Timestamp](s)
    val agg = in.toDF().toDF("ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH:mm").as("h"), col("n"))
    val name = "late_sink"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // batch: on-time rows; high-water mark 10:30 -> watermark 09:30
      in.addData(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"))
      q.processAllAvailable()
      // the two-value watermark: late events are filtered against the
      // PREVIOUS batch's watermark, eviction uses the current one — the
      // processAllAvailable above already ran the no-data batch that
      // promoted 09:30 into the late-event filter (the staged file
      // source in streamLateData needs an explicit empty spacer file
      // for the same promotion)
      // late batch: 00:30 is deep late (window end 01:00 <= wm 09:30 ->
      // DROPPED); 09:45 is late but its window [09:00,10:00) ends past
      // the watermark -> KEPT
      in.addData(ts("2024-01-01 00:30:00"), ts("2024-01-01 09:45:00"))
      q.processAllAvailable()
      // push the watermark to 12:00 so the 09:00 and 10:00 windows
      // finalize; 13:00's own window stays open and must NOT emit
      in.addData(ts("2024-01-01 13:00:00"))
      q.processAllAvailable()
      val got = spark.table(name).as[(String, Long)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(("09:00", 1L), ("10:00", 2L)))
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1L, "exactly the deep-late row is dropped")
    } finally q.stop()
  }

  test("outer interval join eviction timing: an unmatched purchase emits " +
    "only after the watermark passes its event time (flush vs no-flush)") {
    import graft.operators.StreamingAnalytics
    val s = spark
    import s.implicits._
    val ev = Seq(
      ("2024-01-01 10:00:00", "view", 1L, 100L),
      ("2024-01-01 10:15:00", "purchase", 1L, 101L), // matched -> on match
      ("2024-01-01 10:20:00", "purchase", 2L, 102L)) // unmatched -> eviction
      .toDF("ts_s", "event_type", "user_id", "event_id")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("user_id"), col("event_id"))
    val flush = Seq(("2024-01-01 12:00:00", "view", -1L, -1L),
      ("2024-01-01 12:00:00", "purchase", -2L, -2L))
      .toDF("ts_s", "event_type", "user_id", "event_id")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("user_id"), col("event_id"))
    def run(stages: Seq[(String, org.apache.spark.sql.DataFrame)])
        : Map[Long, Option[java.sql.Timestamp]] = {
      val root = Files.createTempDirectory("graft_outer_spec").toString
      StreamingAnalytics.stageOrderedFiles(root, s"$root/in", stages)
      StreamingAnalytics.outerJoinOverStaged(spark, s"$root/in")
        .filter(col("purchase_id") >= 0)
        .collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    }
    // no flush: final watermark = 10:20 - 1h = 09:20 < p2's event time,
    // so the unmatched purchase is WITHHELD (only the matched row emits)
    val without = run(Seq("a" -> ev))
    assert(without.keySet === Set(101L),
      s"unmatched purchase must be withheld before eviction: $without")
    // with the flush sentinel the watermark passes 10:20 and eviction
    // emits the unmatched purchase with a null view side
    val withFlush = run(Seq("a" -> ev, "b_flush" -> flush))
    assert(withFlush.keySet === Set(101L, 102L))
    assert(withFlush(101L).nonEmpty && withFlush(102L).isEmpty)
  }

  test("full outer interval join: view-side unmatched rows emit on " +
    "eviction too (matched pair + orphan purchase + orphan view)") {
    import graft.operators.StreamingAnalytics
    val s = spark
    import s.implicits._
    val ev = Seq(
      ("2024-01-01 10:00:00", "view", 1L, 100L), // matched below
      ("2024-01-01 10:05:00", "view", 3L, 103L), // no purchase follows
      ("2024-01-01 10:15:00", "purchase", 1L, 101L),
      ("2024-01-01 10:20:00", "purchase", 2L, 102L)) // no view precedes
      .toDF("ts_s", "event_type", "user_id", "event_id")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("user_id"), col("event_id"))
    val flush = Seq(("2024-01-01 12:00:00", "view", -1L, -1L),
      ("2024-01-01 12:00:00", "purchase", -2L, -2L))
      .toDF("ts_s", "event_type", "user_id", "event_id")
      .select(col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), col("user_id"), col("event_id"))
    val root = Files.createTempDirectory("graft_fouter_spec").toString
    StreamingAnalytics.stageOrderedFiles(root, s"$root/in",
      Seq("a" -> ev, "b_flush" -> flush))
    val got = StreamingAnalytics
      .outerJoinOverStaged(spark, s"$root/in", "fullOuter")
      .filter(col("user_id") >= 0)
      .select(coalesce(col("purchase_id"), lit(-1L)),
        coalesce(col("view_id"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((101L, 100L), (102L, -1L), (-1L, 103L)))
  }
}
