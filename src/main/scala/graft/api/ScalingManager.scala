package graft.api

import scala.util.control.NonFatal

import graft.observe.{Metrics, Scaling}

/** The scaling evaluation LOOP (ref internal/scaling/manager.go:
  * 110-135 — a ticker driving EvaluatePolicy over every enabled
  * policy at the configured EvaluationInterval, default 30 s for both
  * the generic and the query-engine families, config.go:801,920):
  * every interval, evaluate each ENABLED policy through the store's
  * evaluate methods, which persist the next state (width, cooldown,
  * pending clocks) and append history rows for executed decisions.
  *
  * This is the DECISION layer's runtime — the reference's executor
  * then actuates through K8s; here executed decisions are the
  * observable product (state + history + the `/scaling` routes), and
  * the engine's own elasticity belongs to Spark dynamic allocation,
  * per the SURVEY's standing scoping.
  *
  * One policy's failure (e.g. a malformed metric source value) is
  * logged and never kills the loop or starves later policies. */
final class ScalingManager(cp: ControlPlane,
                           metricSource: () => Map[String, Double] =
                             () => Metrics.global.snapshot(),
                           queryMetricsSource: () => Option[Scaling.QueryMetrics] =
                             () => None,
                           intervalMs: Long = 30000L)
  extends AutoCloseable {

  private val daemon =
    new TickerDaemon("graft-scaling-manager", intervalMs, () => { tick(); () })

  /** One evaluation cycle over both families — safe to call directly
    * (specs, manual ticks); the daemon calls it on the timer. Returns
    * (generic decisions, query decisions) for observability. */
  def tick(): (Seq[(String, Scaling.Decision)],
               Seq[(String, Scaling.QueryDecision)]) = {
    val metrics = metricSource()
    val generic = cp.listScalingPolicies(enabledOnly = true).flatMap { p =>
      try Some(p.id -> cp.evaluateScalingPolicy(p.id, metrics))
      catch {
        case NonFatal(e) =>
          System.err.println(
            s"[graft-scaling] policy ${p.name} failed: ${e.getMessage}")
          None
      }
    }
    val qPolicies = cp.listQueryScalingPolicies().filter(_.enabled)
    // the source is consulted only when a policy will consume it, and
    // its failure costs THIS family's cycle, never the generic one's
    val qm: Option[Scaling.QueryMetrics] =
      if (qPolicies.isEmpty) None
      else try queryMetricsSource() catch {
        case NonFatal(e) =>
          System.err.println(
            s"[graft-scaling] query metrics source failed: ${e.getMessage}")
          None
      }
    val query = qPolicies.flatMap { p =>
      try Some(p.id -> cp.evaluateQueryScalingPolicy(p.id, qm))
      catch {
        case NonFatal(e) =>
          System.err.println(
            s"[graft-scaling] query policy ${p.name} failed: ${e.getMessage}")
          None
      }
    }
    // the idle-detector leg of the loop (ref idle/detector.go's
    // CheckInterval ticker): scale-to-zero policies whose idle
    // threshold passed go to zero width here
    try cp.idleScaleToZeroTick()
    catch {
      case NonFatal(e) =>
        System.err.println(s"[graft-scaling] idle tick failed: ${e.getMessage}")
    }
    (generic, query)
  }

  /** Start the daemon (idempotent). */
  def start(): Unit = daemon.start()

  override def close(): Unit = daemon.close()
}

object ScalingManager {
  /** Query pressure off the SparkContext status tracker — the ONE
    * implementation shared by the loop and the API's
    * `/queryscaling/metrics` endpoint (the reference's counterpart
    * polls Trino /v1/cluster, collector.go:55-160). Both counts are
    * JOB-granular so they partition the active set: a job is QUEUED
    * while none of its active stages has a running task (local mode
    * has no admission queue to read — this is the documented proxy),
    * RUNNING otherwise. Counting queued at stage granularity would
    * double-count one multi-stage job as queued AND running. Only
    * DEFAULT-group jobs are visible ([[org.apache.spark.SparkStatusTracker
    * .getActiveJobIds]]'s contract) — grouped work such as streaming
    * micro-batches rides its own pipeline metrics, not this proxy. */
  def sparkQueryMetrics(spark: org.apache.spark.sql.SparkSession)
  : Scaling.QueryMetrics = {
    val tracker = spark.sparkContext.statusTracker
    val activeStages = tracker.getActiveStageIds().toSet
    // a job is QUEUED only when it demonstrably waits: it has active
    // stages and none of them has a running task. A job between
    // stages (no active stage) or racing the two tracker reads counts
    // as running — a single-tick blip must never inflate queue
    // pressure into a spurious scale-up
    def isQueued(jobId: Int): Boolean =
      tracker.getJobInfo(jobId).exists { j =>
        val active = j.stageIds().filter(activeStages.contains)
        active.nonEmpty && active.forall(sid =>
          tracker.getStageInfo(sid).exists(_.numActiveTasks == 0))
      }
    val (queuedJobs, runningJobs) =
      tracker.getActiveJobIds().partition(isQueued)
    Scaling.QueryMetrics(queued = queuedJobs.length,
      running = runningJobs.length, blocked = 0)
  }
}
