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
  * stages are far shorter), bounded by a 30 s deadline so a runaway
  * streaming workload cannot hang it.
  *
  * The guard is BEST-EFFORT, not mutual exclusion — callers still own
  * the quiesce contract. Two windows remain open by construction: a
  * query submitted AFTER the settle check but before the module
  * invalidates run races them exactly as before, and a driver gap
  * longer than the settle interval inside one query (a multi-second GC
  * pause, a very slow broadcast build) can satisfy the check mid-query.
  * The guard turns the reproduced always-on race into one needing those
  * coincidences; the documented call point ("between workloads, nothing
  * in flight") remains the only guarantee. The per-module
  * `invalidateCaches()` entry points stay raw (no quiesce) for specs
  * that deliberately exercise the racing behavior.
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

  /** Job activity, fed by the listener bus: lets an IDLE context pass
    * quiesce immediately instead of sleeping out a full settle window —
    * the suite and Bench call invalidateAll dozens of times on a quiet
    * context and must not pay ~300 ms each. Listener delivery is async,
    * which only makes the check conservative (a just-ended job keeps
    * lastEndNanos fresh a little longer). */
  private object Activity extends org.apache.spark.scheduler.SparkListener {
    @volatile var lastEndNanos = 0L
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      lastEndNanos = System.nanoTime
  }
  private val listenerRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** No active jobs for [[SettleMs]], or the deadline passed. */
  private val SettleMs = 300L
  private def settled(tracker: org.apache.spark.SparkStatusTracker): Boolean =
    tracker.getActiveJobIds().isEmpty &&
      System.nanoTime - Activity.lastEndNanos >= SettleMs * 1000 * 1000
  private def quiesce(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .filterNot(_.sparkContext.isStopped)
      .foreach { s =>
        val sc = s.sparkContext
        if (listenerRegistered.add(sc.applicationId)) {
          sc.addSparkListener(Activity)
          // registration time counts as activity: a job that ended just
          // BEFORE the listener attached left no event, so the first
          // invalidate must pay one full settle window, not skip it
          Activity.lastEndNanos = System.nanoTime
        }
        val tracker = sc.statusTracker
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        while (!settled(tracker) && System.nanoTime < deadline)
          Thread.sleep(10)
      }
}
