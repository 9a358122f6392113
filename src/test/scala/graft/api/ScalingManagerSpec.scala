package graft.api

import java.nio.file.Files

import graft.SparkTestBase
import graft.observe.Scaling

/** The scaling evaluation loop (ref internal/scaling/manager.go's
  * ticker): both policy families evaluated per tick through the
  * store, enabled-only, with state and history landing there. */
class ScalingManagerSpec extends SparkTestBase {

  test("a tick evaluates every ENABLED policy of both families through the store") {
    val dir = Files.createTempDirectory("graft-scalmgr").toString
    @volatile var now = 100000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    val p1 = cp.createScalingPolicy("workers", "cdc-worker", 1, 4,
      cooldownSeconds = 0L,
      scaleUpRules = Seq(("lag", "gt", 10.0, 0L, 1)))
    val pOff = cp.createScalingPolicy("off", "cdc-worker", 1, 4,
      enabled = false,
      scaleUpRules = Seq(("lag", "gt", 10.0, 0L, 1)))
    val q1 = cp.createQueryScalingPolicy("trino-pool", "trino",
      minReplicas = 1, maxReplicas = 3, cooldownSeconds = 0L)
    val mgr = new ScalingManager(cp,
      metricSource = () => Map("lag" -> 42.0),
      queryMetricsSource = () => Some(Scaling.QueryMetrics(7, 0, 0)))
    try {
      val (g, q) = mgr.tick()
      // generic: only the ENABLED policy evaluated, rule fired 1 -> 2
      assert(g.map(_._1) === Seq(p1.id))
      assert(g.head._2.shouldExecute && g.head._2.desiredReplicas === 2)
      // query family: queued 7 >= default threshold 5 steps 1 -> 2
      assert(q.map(_._1) === Seq(q1.id))
      assert(q.head._2.action === "scale_up" &&
        q.head._2.desiredReplicas === 2)
      // state and history landed in the store; the disabled policy
      // was never touched
      assert(cp.getScalingPolicyState(p1.id).currentReplicas === 2)
      assert(cp.getScalingPolicyState(pOff.id).currentReplicas === 1)
      assert(cp.getQueryScalingState(q1.id).currentReplicas === 2)
      assert(cp.listScalingHistory().size === 1)
      assert(cp.listQueryScalingHistory().size === 1)
      // ticks keep walking the width up (cooldown 0 here)
      now += 1000L
      mgr.tick()
      assert(cp.getScalingPolicyState(p1.id).currentReplicas === 3)
      assert(cp.getQueryScalingState(q1.id).currentReplicas === 3)
    } finally mgr.close()
  }
}
