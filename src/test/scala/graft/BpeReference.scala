package graft

/** Independent in-memory reference BPE trainer (classic mutable-sequence
  * BPE over a collected word-frequency table — a different algorithmic
  * shape from the relational windows/gaps-islands program, so agreement
  * pins the semantics, not the implementation). Shared by the round-9
  * trainer specs and the round-10 tokenizer->packer spec.
  *
  * Sennrich et al.'s algorithm 1: words as mutable symbol vectors,
  * greedy left-to-right non-overlapping apply, overlap-counting pair
  * census, (count DESC, lexicographic) tie-break. */
object BpeReference {

  /** (merge table rows, final word -> symbol-vector map). */
  def trainFull(words: Seq[(String, Long)], rounds: Int)
      : (Seq[(Int, String, String, Long, Long, Long)],
         Map[String, Vector[String]]) = {
    var voc: Seq[(String, Vector[String], Long)] =
      words.map { case (w, f) => (w, w.map(_.toString).toVector :+ "</w>", f) }
    val merges = (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      voc.foreach { case (_, syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      voc = voc.map { case (w, syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (w, out.result(), f)
      }
      val vocabSize = voc.iterator.flatMap(_._2).toSet.size.toLong
      val totalSyms = voc.iterator.map { case (_, s, f) => s.length * f }.sum
      (r, a, b, cnt, vocabSize, totalSyms)
    }
    (merges, voc.map { case (w, syms, _) => w -> syms }.toMap)
  }

  def train(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, Long, Long, Long)] =
    trainFull(words, rounds)._1
}
