package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** One shared SparkSession serving many queries at once — the
  * deployment reality for a library like this (a notebook server, a
  * query service). The risky seam is ours, not Spark's:
  * `ExprColumns.register` mutates the session FunctionRegistry with
  * `createOrReplaceTempFunction` on EVERY query build, so a query
  * planning `graft_cosine_f32` while another thread re-registers it
  * must still resolve correctly. Eight dissimilar queries (custom
  * expressions, windows, streams-free aggregates) run concurrently and
  * must return exactly their sequential results. */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq("dedup_exact", "sim_pq_adc", "dedup_containment",
    "text_langid", "q1_pricing_summary", "dedup_simhash",
    "sim_ann_lsh", "window_rank")

  test("8 queries on one session, concurrent == sequential, 3 rounds") {
    val sequential: Map[String, Seq[String]] = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf0001).collect()
        .map(_.toString).toSeq
    }.toMap
    (1 to 3).foreach { round =>
      val fs = names.map { n =>
        Future(n -> SparkEntry.queries(n)(spark, sf0001).collect()
          .map(_.toString).toSeq)
      }
      val concurrent = Await.result(Future.sequence(fs), 10.minutes).toMap
      names.foreach { n =>
        assert(concurrent(n) == sequential(n),
          s"round $round: $n diverged under concurrency")
      }
    }
  }
}
