package graft

import org.apache.spark.sql.functions._
import graft.functions.ExprColumns

/** The ChunkWords table function: coverage, overlap, edge shapes. */
class ChunkWordsSpec extends SparkSpec {

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Long, String, Long)] = {
    ExprColumns.register(spark)
    import spark.implicits._
    Seq(text).toDF("t")
      .select(expr(s"graft_chunk_words(t, $size, $stride)"))
      .as[(Long, String, Long)].collect().toSeq
  }

  test("short text yields one whole chunk") {
    assert(chunksOf("a b c", 5, 2) == Seq((0L, "a b c", 3L)))
  }

  test("exact-size text yields one chunk") {
    assert(chunksOf("a b c", 3, 1) == Seq((0L, "a b c", 3L)))
  }

  test("overlapping windows cover every word and stride correctly") {
    val words = (1 to 11).map(i => s"w$i")
    val got = chunksOf(words.mkString(" "), 4, 2)
    // ceil((11-4)/2)+1 = 5 chunks
    assert(got.length == 5)
    assert(got.map(_._1) == (0L until 5L))
    // chunk i starts at word i*stride
    got.foreach { case (i, text, n) =>
      val expect = words.slice((i * 2).toInt, math.min(i * 2 + 4, 11).toInt)
      assert(text == expect.mkString(" ") && n == expect.length)
    }
    // tail covered: last chunk ends at the last word
    assert(got.last._2.endsWith("w11"))
  }

  test("coverage + reconstruction on random word counts (property)") {
    // every word lands in >= 1 chunk; non-overlapping config (stride ==
    // size) reconstructs the text exactly when chunks are re-joined
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(200)
      val words = (0 until n).map(i => s"t${seed}w$i")
      val text = words.mkString(" ")
      val (size, stride) = (1 + rnd.nextInt(30), 1 + rnd.nextInt(30))
      val (s2, st2) = (math.max(size, stride), math.min(size, stride))
      val got = chunksOf(text, s2, st2)
      val covered = got.flatMap(_._2.split(" ")).toSet
      assert(covered == words.toSet, s"seed=$seed size=$s2 stride=$st2")
      val exact = chunksOf(text, s2, s2)
      assert(exact.map(_._2).mkString(" ") == text,
        s"non-overlapping chunks must reconstruct: seed=$seed")
    }
  }

  test("null text yields no rows; empty string yields one empty chunk") {
    ExprColumns.register(spark)
    import spark.implicits._
    val df = Seq(Option("x y"), None, Option("")).toDF("t")
      .select(col("t"), expr("graft_chunk_words(t, 2, 1)"))
    val rows = df.collect()
    assert(rows.length == 2) // null generated nothing
    assert(rows.exists(r => r.getString(2) == "" && r.getLong(3) == 1L))
  }
}
