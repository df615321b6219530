package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, StreamingAnalytics, TextAnalysis}

/** Property coverage for the round-16 additions beyond the automatic
  * smoke/oracle gates:
  *
  *  - `graph_louvain_conv`: the convergence loop's rows are BIT-EQUAL
  *    to [[Graph.louvainFull]]'s fixed two levels wherever both
  *    execute (the shared louvainLevelRow/louvainCoarsen kernels), the
  *    last emitted row is the convergence certificate (n_moved = 0)
  *    unless the structural level bound cut the loop, q_start chains
  *    exactly across levels, and q_end is monotone.
  *
  *  - `text_minkprob_contamination`: on a planted corpus where one
  *    test doc is a PARAPHRASE of leaked train content (every 13-gram
  *    broken by substitutions the train corpus also knows) and one is
  *    a VERBATIM copy, min-k%-prob flags BOTH while the exact 13-gram
  *    detector catches only the verbatim one — n_mink_only isolates
  *    the paraphrase-class channel this row adds.
  *
  *  - `stream_hnsw_append`: the merge law (insert-and-reprune
  *    maintenance == from-scratch rebuild, edge for edge) holds at the
  *    default k AND at k=2 (a different prune width exercises the
  *    touched-list re-rank at a different cut), the increments
  *    partition each label block exactly, and both layered descents
  *    agree on the identical index.
  */
class Round16OpsSpec extends SparkSpec {

  test("graph_louvain_conv: rows pin bit-equal to louvainFull's " +
    "levels; last row is the n_moved=0 certificate; q chains exactly") {
    val full = Graph.louvainFull(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("level"))
    val conv = Graph.louvainConverge(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("level"))
    assert(conv.nonEmpty && conv.length <= 4)
    val cols = Seq("level", "n_nodes", "n_communities_start", "n_moved",
      "n_communities_end", "self_loop_w", "q_start", "q_move", "q_end")
    // wherever both ran a level, the SAME kernel must emit the SAME row
    for (i <- 0 until math.min(conv.length, full.length); c <- cols)
      assert(conv(i).getAs[Any](c) === full(i).getAs[Any](c),
        s"level ${i + 1} column $c diverged from louvainFull")
    // convergence certificate: the loop stops when a level accepts
    // zero moves — that level still executes and is emitted — or at
    // the structural bound
    if (conv.length < 4)
      assert(conv.last.getAs[Long]("n_moved") === 0L,
        "an early stop must be certified by an n_moved=0 last row")
    // coarsening preserves Q operand-for-operand: q_start chains
    for (i <- 1 until conv.length)
      assert(conv(i).getAs[Double]("q_start") ===
        conv(i - 1).getAs[Double]("q_end"))
    // acceptance guard: q_end monotone across ALL emitted rows
    for (i <- 1 until conv.length)
      assert(conv(i).getAs[Double]("q_end") >=
        conv(i - 1).getAs[Double]("q_end"))
    // a maxLevels=1 run is exactly louvainFull's first row
    val one = Graph.louvainConverge(spark, sf0001, maxLevels = 1)
      .collect()
    assert(one.length === 1)
    for (c <- cols)
      assert(one.head.getAs[Any](c) === full.head.getAs[Any](c))
  }

  /** Planted corpus: train knows a 60-word template (20 copies), a
    * paraphrase vocabulary (each disturbed bigram seeded 5 times via
    * 3-word fragment docs), and a high-fanout noise graph (every
    * ordered n-word pair once or twice, so background bigrams score
    * low-probability but never OOV). Test docs: 8 noise walks, one
    * paraphrase of the template (substitutions at positions 12, 24,
    * 36, 48 — every 13-window of a 60-word doc crosses one, so NO
    * exact 13-gram survives), one verbatim template copy. */
  private lazy val plantedDir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_minkprob").toString
    val s = spark
    import s.implicits._
    // the md5 split assignment is a pure function of doc_id — find ids
    // that land in each split rather than hoping
    val b = conv(substring(md5(concat(lit("doc:"),
      col("id").cast("string"))), 1, 2), 16, 10).cast("int")
    val ids = spark.range(0, 400)
      .select(col("id"), when(b < 204, "train").when(b < 230, "val")
        .otherwise("test").as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val trainIds = ids.filter(_._2 == "train").map(_._1).take(60)
    val testIds = ids.filter(_._2 == "test").map(_._1).take(10)
    assert(trainIds.length == 60 && testIds.length == 10)
    val template = (1 to 60).map(i => s"t$i").mkString(" ")
    val subs = Seq(12, 24, 36, 48)
    def paraphrase: String = (1 to 60).map { i =>
      if (subs.contains(i)) s"n${subs.indexOf(i) + 1}" else s"t$i"
    }.mkString(" ")
    val templDocs = trainIds.take(20).map(id => (id, template, "tr"))
    val noiseDocs = trainIds.slice(20, 40).zipWithIndex.map {
      case (id, k) =>
        val i = k + 1
        (id, (1 to 20).flatMap(j => Seq(s"n$i", s"n$j")).mkString(" "),
          "tr")
    }
    // each disturbed bigram of the paraphrase appears 5x in train
    val fragDocs = trainIds.slice(40, 60).zipWithIndex.map {
      case (id, k) =>
        val s0 = subs(k % 4)
        (id, s"t${s0 - 1} n${(k % 4) + 1} t${s0 + 1}", "tr")
    }
    val bgDocs = testIds.take(8).zipWithIndex.map { case (id, k) =>
      (id, (1 to 24).map(j => s"n${(j * 7 + k) % 20 + 1}")
        .mkString(" "), "bg")
    }
    val paraDoc = Seq((testIds(8), paraphrase, "para"))
    val verbDoc = Seq((testIds(9), template, "verb"))
    (templDocs ++ noiseDocs ++ fragDocs ++ bgDocs ++ paraDoc ++ verbDoc)
      .toSeq.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  test("text_minkprob_contamination: the planted paraphrase is a " +
    "min-k-only catch; the verbatim copy is caught by both detectors") {
    val rows = TextAnalysis.minkProbContamination(spark, plantedDir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val para = rows("para")
    assert(para.getAs[Long]("n_test") === 1L)
    assert(para.getAs[Long]("n_exact") === 0L,
      "substitutions at every 12th position must break all 13-grams")
    assert(para.getAs[Long]("n_mink") === 1L,
      "the train LM knows even the paraphrase's hardest bigrams")
    assert(para.getAs[Long]("n_mink_only") === 1L)
    val verb = rows("verb")
    assert(verb.getAs[Long]("n_exact") === 1L)
    assert(verb.getAs[Long]("n_mink") === 1L)
    assert(verb.getAs[Long]("n_both") === 1L)
    assert(verb.getAs[Long]("n_mink_only") === 0L)
    val bg = rows("bg")
    assert(bg.getAs[Long]("n_test") === 8L)
    assert(bg.getAs[Long]("n_exact") === 0L)
    assert(bg.getAs[Long]("n_mink") === 0L,
      "unleaked docs must sit above the mean - sd threshold")
    // the paraphrase scores strictly worse (higher NLL) than the
    // verbatim copy but FAR below the background walks
    assert(para.getAs[Double]("mean_mink_nll") >
      verb.getAs[Double]("mean_mink_nll"))
    assert(para.getAs[Double]("mean_mink_nll") <
      bg.getAs[Double]("mean_mink_nll"))
  }

  test("stream_hnsw_append: maintenance equals rebuild edge-for-edge " +
    "at k=3 and k=2; increments partition each label; descents agree") {
    val perLabel = spark.read
      .parquet(s"$sf0001/embeddings.parquet")
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("n")).toMap
    for (k <- Seq(3, 2)) {
      val rows = StreamingAnalytics
        .streamHnswAppend(spark, sf0001, kEdges = k).collect()
      assert(rows.map(_.getAs[Int]("label")).toSet === perLabel.keySet)
      for (r <- rows) {
        val lbl = r.getAs[Int]("label")
        // the MERGE LAW: append-only versioned maintenance resolves to
        // exactly the from-scratch index — zero diff, equal cardinality
        assert(r.getAs[Long]("edge_diff") === 0L,
          s"k=$k label $lbl: maintained index diverged from rebuild")
        assert(r.getAs[Long]("edges_maintained") ===
          r.getAs[Long]("edges_rebuild"))
        // the three stripes partition the label block exactly
        assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_inc1") +
          r.getAs[Long]("n_inc2") === perLabel(lbl))
        assert(r.getAs[Long]("n_inc1") > 0L || r.getAs[Long]("n_inc2") > 0L,
          s"k=$k label $lbl: an increment must actually arrive")
        // identical indexes must descend identically
        assert(r.getAs[Boolean]("agrees_rebuild"),
          s"k=$k label $lbl: descents diverged on an identical index")
        assert(r.getAs[Long]("n_explored") >= 1L)
        val rec = r.getAs[Double]("recall_at_10")
        assert(rec >= 0.0 && rec <= 1.0)
      }
    }
  }
}
