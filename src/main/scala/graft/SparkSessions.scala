package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's scale defaults in ONE place.
  *
  * These are configuration, not code — the same library runs unchanged
  * from local[4] tests to a 1000-executor cluster; only these knobs move:
  *
  *  - AQE on (default since Spark 3.2) with skew-join splitting: runtime
  *    re-planning demotes oversized broadcasts and splits skewed shuffle
  *    partitions without query changes.
  *  - `shuffle.partitions` sized to the environment (cores locally;
  *    2-3x total executor cores on a cluster — AQE coalesces the rest).
  *  - `files.maxPartitionBytes` at the 128 MB default keeps scan tasks
  *    memory-bounded regardless of total input size.
  *  - broadcast threshold at the 10 MB default; dimension tables in this
  *    engine are far below it, and anything larger should shuffle.
  *  - session timezone pinned to UTC: the reference's timestamps are
  *    naive wall-clock strings (SURVEY.md §7.4), so results must never
  *    depend on the host zone.
  */
object SparkSessions {

  def local(cores: Int = Runtime.getRuntime.availableProcessors,
            appName: String = "graft"): SparkSession =
    configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()

  /** Apply the engine defaults to any builder (cluster deploys pass their
    * own master/resource settings and still get the same semantics). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // Completed AvailableNow streaming queries leave one state-store
    // provider per shuffle partition loaded; the default 60s maintenance
    // interval then wakes those threads to snapshot/GC checkpoint files
    // WHILE later batch queries run, degrading them on IO-contended
    // hosts (round-2 bench: every query after stream_* ran 3-20x slow).
    // Short-lived sessions never benefit from background snapshotting —
    // push it past any realistic session lifetime. Long-running streaming
    // deployments should override this back to the default.
    .config("spark.sql.streaming.stateStore.maintenanceInterval", "8h")
}
