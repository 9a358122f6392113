package graft

/** Central release point for the per-(session, dir) persisted-DataFrame
  * caches the extension modules keep (signature sets, scaled vectors,
  * verified pair sets). The bench/verify binaries let process exit clean
  * them up; a long-lived engine embedding this library calls
  * [[invalidateAll]] between workloads to bound executor storage memory.
  *
  * Invalidation must NOT race in-flight queries. This is not just a
  * freshness nicety: uncaching an InMemoryRelation while the AQE stage
  * materializing it is running can make that query return an EMPTY
  * result — zero rows, no exception (reproduced deterministically in
  * EngineCachesSpec's stress sweep: invalidates landing 125–175 ms into
  * a warm pair-cache query yielded Success(0 rows); invalidates landing
  * before or after the materialization window were exact). A silent
  * empty answer is the worst failure class this engine has, so
  * [[invalidateAll]] QUIESCES first: it waits until the context has had
  * no active jobs for a settle interval (gaps between one query's AQE
  * stages are far shorter) before touching any cache, bounded by a
  * 30 s deadline so a runaway streaming workload cannot hang it — the
  * deadline path falls back to the caller-owns-quiesce contract that
  * was always documented. The per-module `invalidateCaches()` entry
  * points stay raw (no quiesce) for specs that deliberately exercise
  * the racing behavior.
  */
object EngineCaches {
  def invalidateAll(): Unit = {
    quiesce()
    extensions.Dedup.invalidateCaches()
    extensions.Similarity.invalidateCaches()
    extensions.Pq.invalidateCaches()
    extensions.TextAnalysis.invalidateCaches()
    extensions.Multimodal.invalidateCaches()
  }

  /** No active jobs for [[SettleMs]], or the deadline passed. */
  private val SettleMs = 300L
  private def quiesce(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .filterNot(_.sparkContext.isStopped)
      .foreach { s =>
        val tracker = s.sparkContext.statusTracker
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        var settledSince = System.nanoTime
        var done = false
        while (!done && System.nanoTime < deadline) {
          if (tracker.getActiveJobIds().nonEmpty) {
            settledSince = System.nanoTime
            Thread.sleep(10)
          } else if (System.nanoTime - settledSince < SettleMs * 1000 * 1000) {
            Thread.sleep(10)
          } else done = true
        }
      }
}
