package graft.observe

import graft.SparkTestBase
import graft.streaming.{PipelineState, StateMachine}
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkTestBase {

  test("state machine enforces the reference transition table") {
    import PipelineState._
    val sm = new StateMachine()
    var seen = List.empty[(Value, Value)]
    sm.onTransition((f, t) => seen = (f, t) :: seen)

    assert(sm.state === Starting)
    assert(!sm.canProcess)
    assert(!sm.transition(Paused))    // starting -> paused is illegal
    assert(sm.transition(Running) && sm.canProcess)
    assert(sm.transition(Paused) && !sm.canProcess)
    assert(sm.transition(Running))
    assert(sm.transition(Stopping))
    assert(!sm.transition(Running))   // stopping -> running is illegal
    assert(sm.transition(Stopped))
    assert(sm.transition(Starting))   // restart is legal
    assert(sm.transition(Failed))
    assert(sm.transition(Starting))   // failed -> starting (recovery)
    assert(seen.length === 8)
  }

  test("health aggregation: unhealthy dominates, throwing checker is unhealthy") {
    import Health._
    val results = runChecks(Map(
      "buffer" -> (() => CheckResult("buffer", Healthy)),
      "catalog" -> (() => CheckResult("catalog", Degraded, "slow")),
      "source" -> (() => throw new RuntimeException("connection refused")),
    ))
    assert(results.map(_.component) === Seq("buffer", "catalog", "source"))
    assert(results.find(_.component == "source").get.status === Unhealthy)
    assert(overall(results) === Unhealthy)
    assert(overall(results.filterNot(_.component == "source")) === Degraded)
    assert(overall(results.filter(_.component == "buffer")) === Healthy)
    assert(overall(Nil) === Unknown)
  }

  test("alert operators match the reference table; unknown op rejected") {
    import spark.implicits._
    val metrics = Seq(("a", 10.0), ("b", 50.0), ("c", 90.0)).toDF("s", "v")
    def states(op: String, t: Double) =
      Alerts.evaluate(metrics, "s", "v", Alerts.Rule("r", op, t))
        .orderBy("series").select("state").as[String].collect().toSeq
    assert(states("gt", 50.0) === Seq("resolved", "resolved", "firing"))
    assert(states("gte", 50.0) === Seq("resolved", "firing", "firing"))
    assert(states("lt", 50.0) === Seq("firing", "resolved", "resolved"))
    assert(states("lte", 50.0) === Seq("firing", "firing", "resolved"))
    assert(states("eq", 50.0) === Seq("resolved", "firing", "resolved"))
    intercept[IllegalArgumentException] {
      Alerts.compare(col("v"), "between", 1.0)
    }
  }

  test("metrics registry: counters accumulate, gauges overwrite, df output") {
    Metrics.reset()
    Metrics.inc("cdc", "events_total", 5)
    Metrics.inc("cdc", "events_total", 3)
    Metrics.inc("cdc", "dlq_total")
    Metrics.setGauge("cdc", "lag_seconds", 2.5)
    Metrics.setGauge("cdc", "lag_seconds", 1.0)
    val snap = Metrics.snapshot()
    assert(snap("philotes_cdc_events_total") === 8.0)
    assert(snap("philotes_cdc_dlq_total") === 1.0)
    assert(snap("philotes_cdc_lag_seconds") === 1.0)
    val rows = Metrics.toDf(spark).collect()
    assert(rows.map(_.getString(0)).contains("philotes_cdc_events_total"))
    Metrics.reset()
  }
}
