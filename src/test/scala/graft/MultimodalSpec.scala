package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}
import graft.operators.{DeterministicFakeDecoder, MediaRecord, Multimodal, RealCodecDecoder}

class MultimodalSpec extends SparkSpec {

  test("mediaRecords carries an opaque BinaryType payload with typed metadata") {
    val rec = Multimodal.mediaRecords(spark, sf0001)
    val schema = rec.schema
    assert(schema("payload").dataType == BinaryType)
    val row = rec.filter(col("doc_id") === 0L).head()
    assert(row.modality == "image")
    assert(row.byte_len == row.payload.length.toLong)
    // payload is the raw UTF-8 of the source text — byte-exact
    val text = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    assert(row.payload.sameElements(text.getBytes("UTF-8")))
  }

  test("extractFeatures: fixed feature width, deterministic, frame math") {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaRecords(spark, sf0001), DeterministicFakeDecoder)
    assert(feats.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    val rows = feats.filter(col("doc_id") < 10).collect().sortBy(_.doc_id)
    assert(rows.forall(_.features.length == DeterministicFakeDecoder.featureDim))
    assert(rows.forall(r => r.n_frames == (r.byte_len + 63) / 64))
    assert(rows.forall(r => r.features.forall(f => f >= 0f && f <= 1f)))
    // deterministic across evaluations
    val again = Multimodal.extractFeatures(
      Multimodal.mediaRecords(spark, sf0001), DeterministicFakeDecoder)
      .filter(col("doc_id") < 10).collect().sortBy(_.doc_id)
    assert(rows.zip(again).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("decoder runs per-partition on executors, preserving partitioning") {
    val rec = Multimodal.mediaRecords(spark, sf0001).repartition(3)
    val feats = Multimodal.extractFeatures(rec, DeterministicFakeDecoder)
    assert(feats.rdd.getNumPartitions == 3)
    assert(feats.count() == rec.count())
  }

  test("real codec decoder is an explicit stub") {
    intercept[NotImplementedError] {
      RealCodecDecoder.decode(Array[Byte](1, 2, 3), "image")
    }
  }

  test("fake decoder features are the md5 bytes of the payload") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val feats = DeterministicFakeDecoder.decode(payload, "audio")
    assert(feats.length == 16)
    md5.zip(feats).foreach { case (b, f) =>
      assert(math.round(f * 255) == (b & 0xff))
    }
  }

  test("resize oracle precondition: documents text is pure ASCII (bytes == chars)") {
    import org.apache.spark.sql.functions.{col, encode, length}
    val nonAscii = Tables(spark, sf0001, "documents")
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0,
      "mm_resize's byte-sliced frames only match the char-sliced DuckDB " +
        "oracle for ASCII text; corpus changed — revisit the oracle")
  }

  test("resize keeps at most target frames and is identity for small payloads") {
    import org.apache.spark.sql.functions.col
    val target = 8
    val rows = Multimodal.resizePayloads(spark, sf0001, target).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val orig = r.getAs[Long]("orig_len")
      val resized = r.getAs[Long]("resized_len")
      assert(resized <= target.toLong * 64, s"over budget: $r")
      assert(resized <= orig)
      // payloads already within budget pass through whole
      if (orig <= target * 64) assert(resized == orig, s"should be identity: $r")
    }
    // identity case really verified byte-for-byte: md5 equals payload md5
    val small = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.encode(col("text"), "UTF-8")).as("m"),
        org.apache.spark.sql.functions.length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (m, len) = small(r.getAs[Long]("doc_id"))
      if (len <= target * 64)
        assert(r.getAs[String]("resized_md5") == m)
    }
  }
}
