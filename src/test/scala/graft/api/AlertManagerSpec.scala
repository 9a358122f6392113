package graft.api

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.HttpServer

import graft.SparkTestBase
import graft.observe.Metrics

/** The alerting manager loop end-to-end (ref internal/alerting/
  * manager.go): store-backed rules polled against a metrics registry,
  * machine transitions recorded as instances + audit history, webhook
  * deliveries over a REAL local HTTP target, silences suppressing
  * notifications, and the reference's resolution-by-absence quirk. */
class AlertManagerSpec extends SparkTestBase {

  test("rules from the store fire, deliver webhooks, silence, and resolve by absence") {
    val dir = Files.createTempDirectory("graft-alertmgr").toString
    @volatile var now = 1000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    val reg = new Metrics.Registry
    // a REAL webhook target capturing payloads
    val received = new ConcurrentLinkedQueue[String]()
    val hook = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    hook.createContext("/", ex => {
      received.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    hook.start()
    try {
      val webhook = cp.createChannel("ops-hook", "webhook",
        config = Map("url" -> s"http://127.0.0.1:${hook.getAddress.getPort}/alert"))
      val email = cp.createChannel("ops-email", "email",
        config = Map("to" -> "ops@x"))
      val dead = cp.createChannel("dead-hook", "webhook",
        config = Map("url" -> "http://127.0.0.1:1/nope"))
      cp.createAlertRule("lag_high", "philotes_cdc_lag_seconds", "gt", 10.0,
        routes = Seq((webhook.id, true, 0L), (email.id, true, 0L)))
      cp.createAlertRule("noise", "philotes_cdc_lag_seconds", "lt", -1.0,
        enabled = false) // disabled rules never evaluate
      val mgr = new AlertManager(cp,
        metricSource = AlertManager.registryMetricSource(reg),
        clock = () => now)
      reg.setGauge("cdc", "lag_seconds", 42.0)
      // tick 1: first trigger records pending only — nothing fires
      assert(mgr.tick().isEmpty)
      assert(cp.listAlertInstances().isEmpty)
      // tick 2: fires — instance + history + BOTH routes notified; the
      // webhook channel POSTs the reference payload, the email channel
      // records delivery (its transport lives outside this process)
      now = 2000L
      val out2 = mgr.tick()
      assert(out2.count(_.delivered) === 2)
      val inst = cp.listAlertInstances(Some("firing")) match {
        case Seq(one) => one
        case other => fail(s"expected one firing instance, got $other")
      }
      assert(inst.fingerprint === "lag_high|_global")
      assert(inst.currentValue === Some(42.0))
      assert(received.size === 1)
      val body = received.poll()
      assert(body.contains(""""event":"fired"""") &&
        body.contains("lag_high|_global"))
      assert(cp.listAlertHistory(inst.id).map(_.eventType) ===
        Seq("fired", "notification_sent", "notification_sent"))
      // a value merely BELOW threshold never resolves (the reference's
      // deliberate behavior: only series absence resolves)
      reg.setGauge("cdc", "lag_seconds", 5.0)
      now = 3000L
      mgr.tick()
      assert(cp.listAlertInstances(Some("firing")).size === 1)
      // back over threshold: the pending clock re-arms, then a SILENCE
      // eats the refire notifications (still audited as suppressed)
      reg.setGauge("cdc", "lag_seconds", 99.0)
      now = 4000L
      mgr.tick() // pending re-records
      cp.createSilence(Map("rule" -> "lag_high"), 4500L, 60000L, "oncall@x")
      now = 5000L
      val out5 = mgr.tick()
      assert(out5.nonEmpty && out5.forall(_.silenced))
      assert(received.isEmpty, "silenced refire must not POST")
      // absence resolves: the gauge disappears from the registry —
      // the resolution notification bypasses the silence? No: silences
      // match the labels regardless of event, same as the reference's
      // notifier consulting silences before any send
      cp.listSilences().foreach(s => cp.deleteSilence(s.id))
      reg.reset()
      now = 6000L
      val out6 = mgr.tick()
      assert(out6.count(n => n.note.event == "resolved" && n.delivered) === 2)
      assert(received.size === 1 &&
        received.poll().contains(""""event":"resolved""""))
      assert(cp.listAlertInstances(Some("firing")).isEmpty)
      assert(cp.alertSummary().get("resolved") === Some(1L))
      // a dead webhook endpoint reports failed delivery and records no
      // notification_sent row
      cp.createAlertRule("dead_rule", "philotes_buffer_depth", "gt", 0.0,
        routes = Seq((dead.id, true, 0L)))
      reg.setGauge("buffer", "depth", 7.0)
      now = 7000L; mgr.tick()
      now = 8000L
      val out8 = mgr.tick()
      val deadOut = out8.filter(_.note.rule == "dead_rule")
      assert(deadOut.size === 1 && !deadOut.head.delivered &&
        deadOut.head.error.isDefined)
      val deadInst = cp.listAlertInstances(Some("firing"))
        .find(_.fingerprint == "dead_rule|_global").get
      assert(cp.listAlertHistory(deadInst.id).map(_.eventType) === Seq("fired"))
      mgr.close()
    } finally hook.stop(0)
  }

  test("a disabled channel suppresses delivery; silences and disabled channels audit as suppressed") {
    val dir = Files.createTempDirectory("graft-alertmgr2").toString
    @volatile var now = 1000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    val reg = new Metrics.Registry
    val received = new ConcurrentLinkedQueue[String]()
    val hook = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    hook.createContext("/", ex => {
      received.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    hook.start()
    try {
      val ch = cp.createChannel("ops-hook", "webhook",
        config = Map("url" -> s"http://127.0.0.1:${hook.getAddress.getPort}/a"))
      cp.createAlertRule("lag_high", "philotes_cdc_lag_seconds", "gt", 10.0,
        routes = Seq((ch.id, true, 0L)))
      val mgr = new AlertManager(cp,
        metricSource = AlertManager.registryMetricSource(reg),
        clock = () => now)
      reg.setGauge("cdc", "lag_seconds", 42.0)
      mgr.tick() // pending
      // the user disables the CHANNEL (per-route enabled still true):
      // the fire cycle must neither POST nor record notification_sent
      cp.updateChannel(ch.id, ch.name, ch.typ, enabled = false, ch.config)
      now = 2000L
      val out = mgr.tick()
      assert(out.size === 1 && !out.head.delivered && !out.head.silenced &&
        out.head.error === Some("channel disabled"))
      assert(received.isEmpty, "a disabled channel must not receive POSTs")
      val inst = cp.listAlertInstances(Some("firing")).head
      assert(cp.listAlertHistory(inst.id).map(_.eventType) ===
        Seq("fired", "notification_suppressed"))
      // re-enabled + silenced: suppression still audits, with its reason
      cp.updateChannel(ch.id, ch.name, ch.typ, enabled = true, ch.config)
      cp.createSilence(Map("rule" -> "lag_high"), 2500L, 60000L, "oncall@x")
      now = 3000L
      mgr.tick() // pending re-arms after the fire; no notification yet
      now = 4000L
      val out3 = mgr.tick() // the refire, eaten by the silence
      assert(out3.size === 1 && out3.head.silenced)
      val hist = cp.listAlertHistory(inst.id)
      assert(hist.count(_.eventType == "notification_suppressed") === 2)
      assert(hist.last.message.contains("silenced"))
      assert(received.isEmpty)
      mgr.close()
    } finally hook.stop(0)
  }
}
