package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** A multimodal record: opaque binary payload + typed metadata. The
  * payload column is `BinaryType` end-to-end — Spark shuffles/spills it
  * like any other column, parquet stores it as BYTE_ARRAY, and nothing
  * driver-side ever touches the bytes. */
case class MediaRecord(doc_id: Long, modality: String,
                       payload: Array[Byte], byte_len: Long)

/** Decoded features for one media record: fixed-width feature vector +
  * frame count (frame = non-overlapping 64-byte window of the payload). */
case class MediaFeatures(doc_id: Long, modality: String, byte_len: Long,
                         n_frames: Long, features: Array[Float])

/** Pluggable per-partition media decoder. Implementations run inside
  * `mapPartitions`, one instance per partition — the place to hold
  * per-partition native resources (codec contexts, model sessions). */
trait MediaDecoder extends Serializable {
  def featureDim: Int
  def decode(payload: Array[Byte], modality: String): Array[Float]
}

/** REAL decoder stub: actual image/audio/video decoding needs native
  * codec libraries not present in this environment. The Spark-side
  * plumbing (schema, partitioning, batch shape) is identical for any
  * [[MediaDecoder]]; swap this in when codecs are available. */
object RealCodecDecoder extends MediaDecoder {
  def featureDim: Int = 16
  def decode(payload: Array[Byte], modality: String): Array[Float] =
    throw new NotImplementedError(
      "real codec decode requires native image/audio libraries; " +
        "use DeterministicFakeDecoder in this environment")
}

/** Deterministic fake decoder: 16 features = the md5 bytes of the payload
  * scaled to [0, 1]. Reproducible in SQL (md5 hex nibble math), so the
  * oracle gate can verify the full mapPartitions path value-by-value. */
object DeterministicFakeDecoder extends MediaDecoder {
  def featureDim: Int = 16
  def decode(payload: Array[Byte], modality: String): Array[Float] = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    digest.map(b => (b & 0xff) / 255.0f)
  }
}

/** Multimodal-column operators (north-star §7.5): binary payloads with
  * typed metadata, decode/feature-extract as a per-partition batch op.
  *
  * The test corpus has no image files, so payloads are the UTF-8 bytes of
  * `documents.text` with a pseudo-modality assigned by doc_id — the
  * COLUMN TYPES, partition/batch shape, and decoder plumbing are exactly
  * what a real image/audio table uses; only the bytes are borrowed.
  *
  * Scale notes: payloads never leave executors; feature extraction is a
  * narrow mapPartitions (no shuffle); decoders are constructed per
  * partition, not per row; downstream aggregations group on small derived
  * columns, never on the binary payload itself.
  */
object Multimodal {

  /** documents -> binary media records. Modality cycles image/audio/video
    * by doc_id so every decoder path gets traffic. */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .as[MediaRecord]
  }

  /** Per-partition batched decode -> features. One decoder per partition;
    * rows stream through without materializing the partition. */
  def extractFeatures(records: Dataset[MediaRecord],
                      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.modality, r.byte_len,
          (r.byte_len + 63) / 64, decoder.decode(r.payload, r.modality))
      }
    }
  }

  /** Payload metadata profile per modality — group keys are derived
    * scalars; the binary column is reduced, never shuffled whole. */
  def payloadStats(spark: SparkSession, dir: String): DataFrame =
    mediaRecords(spark, dir).toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("byte_len")).as("max_bytes"),
        min(col("byte_len")).as("min_bytes"))
      .orderBy(col("modality"))

  /** Frame sampling: explode each payload into its 64-byte frame index
    * space and keep every `stride`-th frame — the video-keyframe access
    * pattern. The explode multiplies rows BEFORE the payload column is
    * dropped, so the projection keeps only (doc_id, frame_no, frame_len):
    * Spark never shuffles the binary column here (audited: group keys are
    * scalars). Zero-byte payloads have zero frames, so they are filtered
    * out before the frame expansion — Spark's `(byte_len - 1) div 64`
    * truncates toward zero, which would otherwise fabricate one empty
    * frame for byte_len = 0 where the oracle's ceil-range yields none. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame =
    mediaRecords(spark, dir).toDF()
      .filter(col("byte_len") > 0)
      .select(col("doc_id"), col("modality"), col("byte_len"),
        explode(sequence(lit(0L), expr("(byte_len - 1) div 64"))).as("frame_no"))
      .filter(col("frame_no") % stride === 0)
      .withColumn("frame_len",
        least(lit(64L), col("byte_len") - col("frame_no") * 64))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum(col("frame_len")).as("bytes_sampled"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("modality"))

  /** Payload "resize": downsample each payload to a target frame budget
    * by keeping every k-th 64-byte frame (k = ceil(n_frames / target)) and
    * re-concatenating the kept frames into a NEW smaller binary payload —
    * the thumbnail/preview transform, byte-level. Runs as a narrow
    * per-partition pass (one `ByteArrayOutputStream` per row, plain
    * `arraycopy`, no shuffle); the doc filter is pushed below the typed
    * map into the parquet scan. Output reports the resized payload as
    * md5 + length so the verified relation never carries binary.
    *
    * Oracle caveat: the DuckDB mirror reconstructs frames with substr
    * over CHARACTERS while this operator slices BYTES — equivalent only
    * because the test corpus is pure ASCII (byte_len == n_chars),
    * asserted in MultimodalSpec so a corpus change fails loudly. */
  def resizePayloads(spark: SparkSession, dir: String,
                     targetFrames: Int = 8): DataFrame = {
    import spark.implicits._
    val resized = mediaRecords(spark, dir)
      .filter(col("doc_id") < 200)
      .mapPartitions { rows =>
        rows.map { r =>
          val nf = ((r.byte_len + 63) / 64).toInt
          val k = math.max(1, math.ceil(nf.toDouble / targetFrames).toInt)
          val out = new java.io.ByteArrayOutputStream(targetFrames * 64)
          var f = 0
          while (f < nf) {
            if (f % k == 0) {
              val start = f * 64
              out.write(r.payload, start,
                math.min(64, r.payload.length - start))
            }
            f += 1
          }
          (r.doc_id, r.modality, r.byte_len, out.toByteArray)
        }
      }.toDF("doc_id", "modality", "orig_len", "resized")
    resized.select(col("doc_id"), col("modality"), col("orig_len"),
        length(col("resized")).cast("long").as("resized_len"),
        md5(col("resized")).as("resized_md5"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual-hash-style near-dup detection over binary payloads: each
    * payload is fingerprinted as the 64-bit SimHash (LONG form) of its
    * distinct 64-byte frames (the frame-set signature of a media file —
    * shared frames vote the same bits, so payloads differing in a few
    * frames land within small Hamming distance). Blocking is 4 x 16-bit
    * bands with 1-bit multiprobe: probes(x) = each band value plus its 16
    * one-bit flips, joined against exact band values of y. Exactness: a
    * pair within Hamming <= 7 has (pigeonhole over 4 disjoint bands) some
    * band differing in <= floor(7/4) = 1 bit, and a 1-bit-different band
    * value is always in the other side's probe set — so blocking recall
    * is 100% for every distance the verify step accepts. `maxHamming`
    * must stay <= 7; raising it past the probe bound would silently drop
    * far pairs.
    *
    * Why multiprobe over plain 8 x 8-bit banding (which has the same
    * <= 7 guarantee): band keys live in a 65536-value space instead of
    * 256, so random candidate collisions scale as n^2/2^16 per band, not
    * n^2/2^8 — 256x fewer false candidates, the difference between a
    * blocked join and a near-cross-join as n grows. The 17x probe
    * expansion is linear in n and tiny (two ints a row). Verification is
    * `bit_count(s1 ^ s2)` on longs — native codegen, no per-pair string
    * loop. Signature is one narrow map per payload (no shuffle); empty
    * payloads are excluded up front (no frames, hence no signature — the
    * oracle's frame unnest drops them the same way). */
  def phashHamming(spark: SparkSession, dir: String,
                   maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7,
      s"maxHamming=$maxHamming exceeds the 1-bit multiprobe guarantee (7)")
    graft.functions.ExprColumns.register(spark)
    val sigs = mediaRecords(spark, dir).toDF()
      .filter(col("byte_len") > 0)
      .select(col("doc_id"), expr(
        """graft_simhash64_long(array_distinct(transform(
             sequence(0, CAST((byte_len - 1) div 64 AS INT)),
             f -> substring(CAST(payload AS STRING), f * 64 + 1, 64))))""")
        .as("sig"))
    val exact = sigs.select(col("doc_id"), col("sig"),
      posexplode(expr(
        """transform(sequence(0, 3),
             b -> CAST(shiftright(sig, b * 16) & 65535 AS INT))""")))
      .toDF("doc_id", "sig", "band", "bits")
    val probes = sigs.select(col("doc_id"), col("sig"),
      explode(expr(
        """flatten(transform(sequence(0, 3), b ->
             transform(sequence(0, 16), p -> struct(
               CAST(b AS INT) AS band,
               CAST((shiftright(sig, b * 16) & 65535)
                 ^ (CASE WHEN p = 0 THEN 0L
                    ELSE shiftleft(1L, CAST(p - 1 AS INT)) END)
                 AS INT) AS bits))))""")).as("pb"))
      .select(col("doc_id"), col("sig"),
        col("pb.band").as("band"), col("pb.bits").as("bits"))
    probes.as("x")
      .join(exact.as("y"), col("x.band") === col("y.band") &&
        col("x.bits") === col("y.bits") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.sig").as("s1"), col("y.sig").as("s2"))
      .distinct()
      .withColumn("hamming",
        expr("CAST(bit_count(s1 ^ s2) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Full decode pipeline through the fake decoder: per-document frame
    * count + first two feature bytes (as exact ints so the oracle compares
    * without float tolerance). */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaRecords(spark, dir),
      DeterministicFakeDecoder)
    feats.toDF()
      .select(col("doc_id"), col("modality"), col("byte_len"), col("n_frames"),
        round(element_at(col("features"), 1) * 255).cast("long").as("f0"),
        round(element_at(col("features"), 2) * 255).cast("long").as("f1"))
      .orderBy(col("doc_id"))
  }

  /** Windowed audio-energy census — the PCM/VAD access pattern over the
    * audio modality: each payload slices into fixed 256-byte windows
    * INSIDE a per-partition pass (one flatMap, no shuffle of the binary
    * column — the same narrow-DSP shape as [[extractFeatures]]), each
    * window reduced to Σ(byte−128)² on the spot, and only the tiny
    * (doc, window, energy) relation reaches the relational layer for
    * the census: window count, total and peak energy, and how many
    * windows sit within 10% of the doc's peak (the "sustained loudness"
    * readout — peak-relative, so it is corpus-independent where a fixed
    * threshold would be arbitrary). Energies are exact integers; the
    * only division is one rounded ratio. A real deployment swaps the
    * byte slicer for a codec frame iterator behind the same
    * [[MediaDecoder]] seam. */
  /** (doc_id, win_no, energy) relation over the audio payloads — the
    * shared window kernel of [[audioEnergy]] and [[audioNearDup]]
    * (one definition, so the census and the near-dup signature can
    * never disagree on what a window IS). Per-partition codec-seam
    * mapPartitions, exactly as [[extractFeatures]]. */
  private def energyWindows(spark: SparkSession, dir: String,
                            win: Int): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .filter(col("modality") === "audio").as[MediaRecord]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          r.payload.grouped(win).zipWithIndex.map { case (chunk, i) =>
            var e = 0L
            var k = 0
            while (k < chunk.length) {
              val v = (chunk(k) & 0xff) - 128
              e += v.toLong * v
              k += 1
            }
            (r.doc_id, i.toLong, e)
          }
        }
      }.toDF("doc_id", "win_no", "energy")
  }

  def audioEnergy(spark: SparkSession, dir: String,
                  win: Int = 256): DataFrame = {
    val wins = energyWindows(spark, dir, win)
    val peaked = wins.withColumn("peak",
      max(col("energy")).over(Window.partitionBy(col("doc_id"))))
    peaked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("energy")).as("total_energy"),
        max(col("energy")).as("peak_energy"),
        sum(when(col("energy") * 10 >= col("peak") * 9, 1L).otherwise(0L))
          .as("n_near_peak"))
      .withColumn("near_peak_ratio",
        round(col("n_near_peak").cast("double") / col("n_windows"), 4))
      .orderBy(col("doc_id"))
  }

  /** AUDIO near-duplicate pairs by banded energy fingerprints — the
    * modality-dedup rung between [[phashHamming]] (image) and the text
    * ladder: each audio payload's per-window energies quantize to
    * coarse levels, consecutive windows group into BANDS whose level
    * sequence is fingerprinted, and two payloads are near-dups when
    * their band fingerprints mostly agree (the acoustic-fingerprint
    * shape — Shazam-style constellation hashing reduced to the energy
    * envelope, which is what the byte-window decoder seam can see
    * without a real codec).
    *
    * The candidate/pair machinery IS [[DedupOps.shinglePairStatsOf]]
    * with `(band, fingerprint)` as the shingle — one posting shuffle,
    * the [[DedupOps.MaxShingleDf]] hot-posting cap (a silence band
    * shared by everything is this modality's stopword), and agreement
    * = shared bands over the larger band count, all exact integers
    * until one rounded division. */
  def audioNearDup(spark: SparkSession, dir: String, win: Int = 256,
                   bandWins: Int = 4, minPct: Int = 50): DataFrame = {
    val sigs = energyWindows(spark, dir, win)
      .withColumn("ql", expr("energy div 16384"))
      .withColumn("band", expr(s"win_no div $bandWins"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws(",", expr(
        """transform(array_sort(collect_list(struct(win_no, ql))),
             x -> CAST(x.ql AS STRING))"""))).as("bucket"))
      .select(col("doc_id"),
        concat(col("band").cast("string"), lit(":"), col("bucket"))
          .as("shingle"))
    DedupOps.shinglePairStatsOf(sigs)
      .filter(col("inter") * 100 >=
        greatest(col("n1"), col("n2")) * minPct)
      .select(col("d1"), col("d2"),
        col("inter").as("n_bands_agree"),
        col("n1").as("n_bands_1"), col("n2").as("n_bands_2"),
        round(col("inter").cast("double") /
          greatest(col("n1"), col("n2")).cast("double"), 3)
          .as("band_frac"))
      .orderBy(col("d1"), col("d2"))
  }

  /** MULTIMODAL sequence packing — [[TextAnalysis.packSequences]]'
    * fixed-window census with modality-correct COSTS, the shard-prep
    * step for interleaved image/audio/video-text training: a
    * document's sequence cost is its whitespace token count plus its
    * patch tokens (49 per image frame — the 224²/32² ViT grid; 25 per
    * audio frame; 16 per video frame), and the 1024-token windows cut
    * the per-modality cost stream exactly as the text packer cuts
    * token streams (same shared census kernel, so the two packers can
    * never drift on the window rule): windows are cut per modality
    * STREAM, and the final census histograms windows by
    * documents-per-window across the three streams.
    *
    * All integer; one payload-metadata pass (costs derive from byte
    * length, the payload never shuffles), then the packer's
    * per-modality cumsum window. */
  def packBudget(spark: SparkSession, dir: String,
                 budget: Int = 1024): DataFrame = {
    val perFrame = map_from_arrays(
      typedLit(Seq("image", "audio", "video")),
      typedLit(Seq(49L, 25L, 16L)))
    val costs = mediaRecords(spark, dir).toDF()
      .withColumn("n_frames", expr("(byte_len + 63) div 64"))
      .select(col("modality").as("source"), col("doc_id"),
        (graft.functions.TextFunctions.tokenCount(
          decode(col("payload"), "UTF-8")) +
          element_at(perFrame, col("modality")) * col("n_frames"))
          .as("n_tok"))
    TextAnalysis.packCensus(costs, budget)
  }

  /** Scene-CUT segmentation for the video modality — the
    * intensity-delta detector every video curation pipeline runs
    * before frame sampling (cut where consecutive frames differ
    * sharply; scenes = cuts + 1): per 64-byte frame an integer
    * "intensity" (byte sum — the [[audioEnergy]] discipline one
    * modality over), a per-document lag delta, and a cut wherever
    * |Δ| ≥ 300 (the corpus's ~p75 delta; partial tail frames read as
    * a final cut, documented and mirrored in the oracle). Census per
    * document: frames, cuts, scenes, mean scene length, max delta —
    * the shot-boundary profile a frame-sampler stratifies on.
    *
    * Scale shape: intensity extraction is the narrow per-partition
    * byte pass at the codec seam (decoder-adjacent, payloads never
    * shuffle); the lag window is per-document over its own frames
    * (payload-bounded, never corpus-wide); the census is one doc-grain
    * agg. All arithmetic integer-exact. */
  def sceneCuts(spark: SparkSession, dir: String,
                threshold: Long = 300): DataFrame = {
    import spark.implicits._
    val frames = mediaRecords(spark, dir)
      .filter(col("modality") === "video" && col("byte_len") > 0)
      .as[MediaRecord]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          r.payload.grouped(64).zipWithIndex.map { case (chunk, i) =>
            var s = 0L
            var k = 0
            while (k < chunk.length) { s += (chunk(k) & 0xff); k += 1 }
            (r.doc_id, i.toLong, s)
          }
        }
      }.toDF("doc_id", "f", "inten")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
    frames
      .withColumn("delta", abs(col("inten") - lag(col("inten"), 1).over(w)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") >= threshold, 1L).otherwise(0L)).as("n_cuts"),
        max(coalesce(col("delta"), lit(0L))).as("max_delta"))
      .withColumn("n_scenes", col("n_cuts") + 1)
      .select(col("doc_id"), col("n_frames"), col("n_cuts"),
        col("n_scenes"),
        round(col("n_frames").cast("double") /
          col("n_scenes").cast("double"), 4).as("mean_scene_len"),
        col("max_delta"))
      .orderBy(col("doc_id"))
  }

  /** ViT-style PATCH-GRID census over the decoded feature map — the
    * preprocessing shape every vision-transformer pipeline runs
    * (decode → patchify → per-patch statistics): each record's 16
    * decoded features ([[DeterministicFakeDecoder]] through the real
    * `mapPartitions` seam — one decoder per partition, payloads never
    * shuffled) reshape into a 4×4 grid read as 4 row BANDS of 4
    * patches, and the census reports per (modality, band): value
    * count, exact integer intensity sum (features reconstruct to
    * their byte values ×255, the [[featureExtract]] convention), mean
    * intensity in [0,1], and the min/max byte. A real deployment
    * swaps the decoder; the grid algebra, schema, and partition shape
    * are exactly this.
    *
    * Narrow decode pass → 16-row explode (constant factor) → a
    * |modality|×4-row census; no shuffle touches the payload. */
  def patchGrid(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaRecords(spark, dir),
      DeterministicFakeDecoder)
    feats.toDF()
      .select(col("doc_id"), col("modality"),
        posexplode(col("features")))
      .select(col("modality"), (col("pos") / 4).cast("int").as("band"),
        round(col("col") * 255).cast("long").as("byte_val"))
      .groupBy(col("modality"), col("band"))
      .agg(count(lit(1)).as("n_values"),
        sum(col("byte_val")).as("sum_bytes"),
        round(sum(col("byte_val")).cast("double") /
          (count(lit(1)) * 255).cast("double"), 6).as("mean_intensity"),
        min(col("byte_val")).as("min_byte"),
        max(col("byte_val")).as("max_byte"))
      .orderBy(col("modality"), col("band"))
  }
  /** Constellation-hash AUDIO FINGERPRINT matching (the Shazam shape on
    * the energy envelope): local peaks of the per-window energy series
    * become anchor points, each anchor pairs with its next ≤3 peaks,
    * and the (quantized-energy, quantized-energy, time-delta) triple
    * hashes into the doc's fingerprint set (32-byte windows — the
    * envelope resolution the short test payloads support); documents
    * sharing ≥2
    * hashes are reported with their match score. Where
    * [[audioNearDup]] fingerprints CONTIGUOUS band sequences (fragile
    * to insertion), peak-pair hashes survive local edits — the reason
    * constellation pairs, not envelopes, are the industry fingerprint.
    *
    * The cross-doc matcher IS [[DedupOps.shinglePairStatsOf]] with the
    * pair hash as the shingle — one posting-keyed shuffle, the
    * hot-posting df cap, no pair space. Peak finding is two window
    * functions over the doc-partitioned energy series; the pair
    * expansion is rank-bounded (≤3 per anchor), so the fingerprint
    * relation is linear in audio length. */
  def audioFingerprint(spark: SparkSession, dir: String, win: Int = 32,
      fanout: Int = 3): DataFrame = {
    val wins = energyWindows(spark, dir, win)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("win_no"))
    val peaks = wins
      .withColumn("pe", lag(col("energy"), 1).over(w))
      .withColumn("ne", lead(col("energy"), 1).over(w))
      .filter(col("energy") > coalesce(col("pe"), lit(-1L)) &&
        col("energy") >= coalesce(col("ne"), lit(-1L)))
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("rk"), col("win_no"),
        expr("energy div 4096").as("q"))
      .localCheckpoint() // peak-grain relation, self-joined once
    val a = peaks.toDF("doc_id", "rk", "w1", "q1")
    val b = peaks.toDF("doc_id", "rk2", "w2", "q2")
    val sigs = a.join(b, a("doc_id") === b("doc_id") &&
        b("rk2") > a("rk") && b("rk2") <= a("rk") + fanout)
      .select(a("doc_id"),
        md5(concat(col("q1").cast("string"), lit(":"),
          col("q2").cast("string"), lit(":"),
          (col("w2") - col("w1")).cast("string"))).as("shingle"))
      .distinct()
    DedupOps.shinglePairStatsOf(sigs)
      .filter(col("inter") >= 2)
      .select(col("d1"), col("d2"), col("inter").as("n_shared"),
        col("n1"), col("n2"),
        round(col("inter").cast("double") /
          least(col("n1"), col("n2")).cast("double"), 6).as("score"))
      .orderBy(col("n_shared").desc, col("d1"), col("d2"))
  }

  /** Voice-activity-style SEGMENTATION of each audio track — the step
    * between [[audioEnergy]]'s per-track census and a real
    * speech-pipeline's clip extraction: a window is ACTIVE when its
    * energy reaches 90% of the track peak (energy·10 ≥ peak·9 —
    * integer compare, no float threshold; 32-sample windows so the
    * energy profile has real structure), active runs separated by at
    * most one inactive window are merged (the hangover that keeps
    * short pauses inside one utterance), and the census reports per
    * track the segment count, active mass, longest segment and first
    * onset.
    *
    * Plan: the [[audioEnergy]] window relation (per-partition decode,
    * corpus-linear), per-track lag/run windows at window grain, a
    * segment-grain reduce, a track-grain census. All integers. */
  def vadSegments(spark: SparkSession, dir: String,
      win: Int = 32, hangover: Int = 1): DataFrame = {
    val wins = energyWindows(spark, dir, win)
    val tot = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        max(col("energy")).as("peak"))
    val active = wins.join(tot, Seq("doc_id"))
      .filter(col("energy") * 10 >= col("peak") * 9)
    val segs = active
      .withColumn("prev", lag(col("win_no"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("win_no"))))
      .withColumn("new_seg",
        when(col("prev").isNull ||
          col("win_no") - col("prev") > hangover + 1, 1L).otherwise(0L))
      .withColumn("seg_id", sum(col("new_seg")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("win_no"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("seg_id"))
      .agg(min(col("win_no")).as("s"), max(col("win_no")).as("e"),
        count(lit(1)).as("n_active"))
    segs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("n_active")).as("n_active_windows"),
        max(col("e") - col("s") + 1).as("longest_segment"),
        min(col("s")).as("first_onset"))
      .join(tot.select(col("doc_id"), col("n_windows")), Seq("doc_id"))
      .withColumn("active_ratio",
        round(col("n_active_windows").cast("double") /
          col("n_windows").cast("double"), 4))
      .orderBy(col("doc_id"))
  }
}
