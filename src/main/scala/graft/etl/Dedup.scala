package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's dedup core (F5 window filter + F6 key filter + J1
  * left-anti join; main.py:168-181) as declarative relational ops.
  *
  * Semantics preserved exactly:
  *  - cross-run dedup ONLY: duplicates *within* one batch are kept
  *    (anti-join never dedups the probe side);
  *  - rows with NULL or empty-string key are dropped before the sink
  *    (main.py:180 truthiness);
  *  - the existing-side is pre-filtered by the inclusive time window
  *    (main.py:172-174) so state stays small.
  *
  * Scale notes: the reference materializes the whole existing-key set in
  * driver memory (a hard cap at a few million rows). Here the anti-join is
  * planned by Catalyst: broadcast-hash LeftAnti while the (window-filtered,
  * single-column) build side is under `autoBroadcastJoinThreshold`, shuffled
  * sort-merge anti beyond it — both fully distributed, and AQE can demote a
  * too-large broadcast at runtime. No driver materialization anywhere.
  */
object Dedup {

  /** F5 — inclusive time-window predicate (pushed into the scan by
    * Catalyst; main.py:117 + :173 push it to both external systems). */
  def windowFilter(c: Column, from: String, to: String): Column =
    c >= lit(from).cast("timestamp") && c <= lit(to).cast("timestamp")

  /** F6 — non-null / non-empty key predicate (main.py:175,180). */
  def validKey(c: Column): Column = c.isNotNull && c =!= ""

  /** J1 — keep only batch rows whose key is absent from `existing`.
    * `existing` should already be window-filtered (see K2: the reference's
    * dedup SELECT reads one column under the window predicate). */
  def newRows(batch: DataFrame, existing: DataFrame, key: String): DataFrame = {
    val probe = batch.filter(validKey(col(key)))
    val build = existing.filter(validKey(col(key))).select(key)
    probe.join(build, Seq(key), "left_anti")
  }
}
