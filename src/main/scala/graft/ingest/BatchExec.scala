package graft.ingest

import org.apache.spark.sql.DataFrame

/** Re-enables Adaptive Query Execution for BATCH work running inside a
  * streaming `foreachBatch` body.
  *
  * Structured Streaming clones the session per query and force-disables
  * `spark.sql.adaptive.enabled` on the clone (AQE cannot re-optimize a
  * stateful streaming plan mid-run), and `foreachBatch` hands the user
  * function a DataFrame bound to that clone — so every action the merge/
  * route/commit operators run inside a batch body silently loses AQE:
  * no post-shuffle coalescing (every tiny probe pays the full
  * `spark.sql.shuffle.partitions` fan-out), no runtime join re-planning,
  * no skew splitting. Measured on the sf0.1 bench: the per-micro-batch
  * merge jobs run 32-task reduce stages over kilobytes.
  *
  * Those actions are plain batch queries — the same operators already
  * run under AQE when driven from a batch context (dlq_stats, sql_merge)
  * — so flipping the conf back on around the body is semantics-free and
  * restores the scale-adaptive partitioning the optimization guide (§2)
  * asks for: partition counts derived from runtime sizes, not a constant
  * tuned for either local mode or the cluster.
  *
  * The previous value is restored on exit so the streaming engine's own
  * per-batch planning (which happens between body invocations) always
  * sees the conf exactly as it configured it. */
object BatchExec {
  private val Key = "spark.sql.adaptive.enabled"

  /** Run `body` with AQE enabled on `df`'s session (the streaming clone
    * inside foreachBatch; the caller's own session in batch contexts,
    * where this is a no-op). */
  def withAqe[T](df: DataFrame)(body: => T): T = {
    val conf = df.sparkSession.conf
    val prev = conf.getOption(Key)
    conf.set(Key, "true")
    try body
    finally prev match {
      case Some(v) => conf.set(Key, v)
      case None    => conf.unset(Key)
    }
  }
}
