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
    * quiesce after one bus-lag confirmation (~[[BusLagMs]]) instead of
    * sleeping out a full settle window — the suite and Bench call
    * invalidateAll dozens of times on a quiet context. Job-END delivery
    * being async only makes the check conservative (a just-ended job
    * keeps lastEndNanos fresh a little longer); job-START visibility
    * lag is the dangerous direction, covered by the double read in
    * [[quiesce]]. */
  private object Activity extends org.apache.spark.scheduler.SparkListener {
    // initialized to CLASS-LOAD time, which the JVM's class-init lock
    // publishes to every thread: a job that ended just before the
    // listener attached (or a quiesce racing the registration block)
    // still sees a fresh timestamp and pays the settle window — it can
    // never read a stale 0 and skip it
    @volatile var lastEndNanos: Long = System.nanoTime
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      lastEndNanos = System.nanoTime
  }
  private val listenerRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** No active jobs for [[SettleMs]], or the deadline passed. */
  private val SettleMs = 300L
  /** Upper bound on listener-bus lag for a job-START to reach the app
    * status store: settled() must be observed TWICE this far apart,
    * because a query submitted microseconds ago can be invisible to
    * getActiveJobIds() on the first read — an instant single-read pass
    * would re-open the mid-materialization window on exactly that
    * query. */
  private val BusLagMs = 100L
  private def settled(tracker: org.apache.spark.SparkStatusTracker): Boolean =
    tracker.getActiveJobIds().isEmpty &&
      System.nanoTime - Activity.lastEndNanos >= SettleMs * 1000 * 1000
  private def quiesce(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .filterNot(_.sparkContext.isStopped)
      .foreach { s =>
        val sc = s.sparkContext
        // registration may race a concurrent context stop — a teardown
        // caller must get a no-op invalidate, not an exception out of
        // the listener bus; on failure drop the id so a later (live)
        // registration can retry
        if (listenerRegistered.add(sc.applicationId)) {
          try sc.addSparkListener(Activity)
          catch { case _: IllegalStateException =>
            listenerRegistered.remove(sc.applicationId)
            return
          }
        }
        val tracker = sc.statusTracker
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        var confirmed = false
        while (!confirmed && System.nanoTime < deadline) {
          if (!settled(tracker)) Thread.sleep(10)
          else {
            Thread.sleep(BusLagMs) // let a just-submitted job surface
            confirmed = settled(tracker)
          }
        }
        // an unsettled invalidation proceeding past the deadline is the
        // exact silent-empty-result window this guard exists for — it
        // must at least be diagnosable in a busy long-lived engine's log
        if (!confirmed) System.err.println(
          "[graft] EngineCaches.invalidateAll: quiesce deadline (30s) " +
            "expired with jobs still active — invalidating anyway; " +
            "in-flight queries may race the uncache")
      }
}
