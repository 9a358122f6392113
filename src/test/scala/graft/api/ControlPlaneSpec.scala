package graft.api

import java.nio.file.Files

import graft.SparkTestBase

/** Control-plane CRUD + lifecycle semantics (ref internal/api/services/
  * pipeline.go:38-216, source.go:34-120): uniqueness conflicts,
  * referential checks, the status machine, runner actuation (where the
  * reference's Start/Stop are TODO stubs), and crash-safe persistence
  * with restart truth (a pipeline recorded running by a dead process
  * loads as stopped). */
class ControlPlaneSpec extends SparkTestBase {

  private def freshDir(): String =
    Files.createTempDirectory("graft-ctrl").toString

  private final class RecordingRunner(failStart: Boolean = false)
    extends ControlPlane.Runner {
    var starts = 0
    var stops = 0
    override def start(p: ControlPlane.Pipeline, s: ControlPlane.Source): Unit = {
      starts += 1
      if (failStart) throw new IllegalStateException("runner refused")
    }
    override def stop(p: ControlPlane.Pipeline): Unit = stops += 1
  }

  private def plane(dir: String, runner: ControlPlane.Runner = ControlPlane.Noop) =
    new ControlPlane(dir, runner, connTest = _ => Right(1L))

  test("source + pipeline CRUD: uniqueness, referential checks, validation") {
    val cp = plane(freshDir())
    val src = cp.createSource("pg-main", "", "db.example", 0, "appdb", "rep")
    assert(src.typ === "postgres" && src.port === 5432) // defaults applied
    intercept[ControlPlane.Conflict](
      cp.createSource("pg-main", "", "other", 5432, "x", "y"))
    intercept[ControlPlane.Invalid](
      cp.createSource("", "", "h", 5432, "d", "u"))
    intercept[ControlPlane.Invalid](
      cp.createSource("no-host", "", "", 5432, "d", "u"))
    // pipeline requires an existing source; duplicate mappings conflict
    intercept[ControlPlane.NotFound](
      cp.createPipeline("p1", "nope", Seq(("public", "users", true))))
    intercept[ControlPlane.Conflict](cp.createPipeline("p1", src.id,
      Seq(("public", "users", true), ("public", "users", false))))
    val p = cp.createPipeline("p1", src.id,
      Seq(("public", "users", true), ("public", "orders", true)))
    assert(p.status === "stopped" && p.tables.size === 2)
    intercept[ControlPlane.Conflict](cp.createPipeline("p1", src.id, Nil))
    // a source with pipelines refuses deletion; after pipeline delete it goes
    intercept[ControlPlane.Conflict](cp.deleteSource(src.id))
    // mappings: add (dup conflicts), remove (unknown 404s)
    val p2 = cp.addTableMapping(p.id, "public", "events", enabled = true)
    assert(p2.tables.size === 3)
    intercept[ControlPlane.Conflict](
      cp.addTableMapping(p.id, "public", "events", enabled = true))
    intercept[ControlPlane.NotFound](cp.removeTableMapping(p.id, "ghost"))
    assert(cp.removeTableMapping(p.id, p2.tables.last.id).tables.size === 2)
    cp.deletePipeline(p.id)
    intercept[ControlPlane.NotFound](cp.getPipeline(p.id))
    cp.deleteSource(src.id)
    assert(cp.listSources().isEmpty)
  }

  test("status machine with runner actuation; failure lands in error, not a running lie") {
    val dir = freshDir()
    val runner = new RecordingRunner()
    val cp = plane(dir, runner)
    val src = cp.createSource("s", "", "h", 5432, "d", "u")
    val p = cp.createPipeline("p", src.id, Seq(("public", "t", true)))
    assert(cp.startPipeline(p.id).status === "running")
    assert(runner.starts === 1)
    intercept[ControlPlane.Conflict](cp.startPipeline(p.id))
    intercept[ControlPlane.Conflict](cp.updatePipeline(p.id, "renamed"))
    intercept[ControlPlane.Conflict](cp.deletePipeline(p.id))
    val stopped = cp.stopPipeline(p.id)
    assert(stopped.status === "stopped" && runner.stops === 1)
    assert(stopped.startedAtMs.isDefined && stopped.stoppedAtMs.isDefined)
    intercept[ControlPlane.Conflict](cp.stopPipeline(p.id))
    // a refusing runner: status error + error_message, start reports 409
    val failing = plane(freshDir(), new RecordingRunner(failStart = true))
    val fsrc = failing.createSource("s", "", "h", 5432, "d", "u")
    val fp = failing.createPipeline("p", fsrc.id, Nil)
    intercept[ControlPlane.Conflict](failing.startPipeline(fp.id))
    val after = failing.getPipeline(fp.id)
    assert(after.status === "error" &&
      after.errorMessage.contains("runner refused"))
    // an errored pipeline can be stopped back to rest
    assert(failing.stopPipeline(fp.id).status === "stopped")
  }

  test("a dead drain loop surfaces as error through refreshStatus, never a stale running") {
    val runner = new ControlPlane.Runner {
      @volatile var dead = false
      override def start(p: ControlPlane.Pipeline, s: ControlPlane.Source): Unit = ()
      override def stop(p: ControlPlane.Pipeline): Unit = ()
      override def health(p: ControlPlane.Pipeline): Option[String] =
        if (dead) Some("drain loop died: socket reset") else None
    }
    val cp = plane(freshDir(), runner)
    val src = cp.createSource("s", "", "h", 5432, "d", "u")
    val p = cp.createPipeline("p", src.id, Nil)
    cp.startPipeline(p.id)
    assert(cp.refreshStatus(p.id).status === "running")
    runner.dead = true
    val refreshed = cp.refreshStatus(p.id)
    assert(refreshed.status === "error" &&
      refreshed.errorMessage.contains("socket reset"))
    // an errored pipeline can be stopped and restarted
    assert(cp.stopPipeline(p.id).status === "stopped")
  }

  test("source passwords persist with the store but never render in API responses") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val dir = freshDir()
    val cp = plane(dir)
    val srv = new ApiServer(spark, controlPlane = Some(cp))
    try {
      val http = HttpClient.newHttpClient()
      val r = http.send(HttpRequest.newBuilder(
        URI.create(srv.baseUri + "/api/v1/sources"))
        .method("POST", HttpRequest.BodyPublishers.ofString(
          """{"name":"pg","host":"h","database_name":"d","username":"u","password":"sekrit"}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 201)
      assert(!r.body().contains("sekrit"), s"credential leaked: ${r.body()}")
      val listed = http.send(HttpRequest.newBuilder(
        URI.create(srv.baseUri + "/api/v1/sources")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(!listed.body().contains("sekrit"))
      // ...but a reopened store (and so the runner/probes) still holds it
      val reopened = plane(dir)
      assert(reopened.listSources().head.password === "sekrit")
    } finally srv.close()
  }

  test("persistence: atomic files survive reopen; stale running status loads stopped") {
    val dir = freshDir()
    val cp = plane(dir)
    val src = cp.createSource("s", "", "h", 5432, "d", "u")
    val p = cp.createPipeline("p", src.id, Seq(("public", "t", true)))
    cp.startPipeline(p.id) // leaves persisted status "running"
    val reopened = plane(dir)
    assert(reopened.listSources().map(_.name) === Seq("s"))
    val rp = reopened.getPipeline(p.id)
    assert(rp.tables.map(_.sourceTable) === Seq("t"))
    // THIS process is not running that pipeline: restart truth
    assert(rp.status === "stopped")
  }

  test("the /api/v1 HTTP route group serves the store with reference statuses") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val cp = plane(freshDir())
    val srv = new ApiServer(spark, controlPlane = Some(cp))
    val http = HttpClient.newHttpClient()
    def call(method: String, path: String, body: String = ""): (Int, JValue) = {
      val b = HttpRequest.newBuilder(URI.create(srv.baseUri + path))
      val req = method match {
        case "GET"    => b.GET()
        case "DELETE" => b.DELETE()
        case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
      }
      val r = http.send(req.build(), HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), JsonMethods.parse(r.body()))
    }
    try {
      val (cs, cb) = call("POST", "/api/v1/sources",
        """{"name":"pg","host":"h","database_name":"d","username":"u"}""")
      assert(cs === 201)
      val srcId = (cb \ "id").asInstanceOf[JString].s
      assert(call("POST", "/api/v1/sources",
        """{"name":"pg","host":"h","database_name":"d","username":"u"}""")._1 === 409)
      assert(call("POST", "/api/v1/sources",
        """{"name":"bad"}""")._1 === 400)
      val (ps, pb) = call("POST", "/api/v1/pipelines",
        s"""{"name":"p1","source_id":"$srcId","tables":[{"schema":"public","table":"users"}]}""")
      assert(ps === 201)
      val pid = (pb \ "id").asInstanceOf[JString].s
      assert(call("GET", s"/api/v1/pipelines/$pid")._1 === 200)
      assert(call("GET", "/api/v1/pipelines/nope")._1 === 404)
      assert(call("POST", s"/api/v1/pipelines/$pid/start")._1 === 200)
      assert(call("POST", s"/api/v1/pipelines/$pid/start")._1 === 409)
      val (_, st) = call("GET", s"/api/v1/pipelines/$pid/status")
      assert((st \ "status") === JString("running"))
      assert(call("DELETE", s"/api/v1/sources/$srcId")._1 === 409)
      assert(call("POST", s"/api/v1/pipelines/$pid/stop")._1 === 200)
      val (ts, tb) = call("POST", s"/api/v1/pipelines/$pid/tables",
        """{"schema":"public","table":"orders"}""")
      assert(ts === 201)
      val mapIds = (tb \ "tables" \ "id" \\ classOf[JString])
      assert(mapIds.size === 2)
      assert(call("DELETE",
        s"/api/v1/pipelines/$pid/tables/${mapIds.last}")._1 === 200)
      assert(call("PUT", s"/api/v1/pipelines/$pid",
        """{"name":"p1-renamed"}""")._1 === 200)
      assert(call("DELETE", s"/api/v1/pipelines/$pid")._1 === 200)
      assert(call("DELETE", s"/api/v1/sources/$srcId")._1 === 200)
      assert(call("GET", "/api/v1/nope")._1 === 404)
    } finally srv.close()
  }

  test("alert-rule CRUD: validation, uniqueness, route identity, persistence, evaluator wiring") {
    val dir = freshDir()
    val cp = plane(dir)
    // operator vocabulary is closed; metric and name are required
    intercept[ControlPlane.Invalid] {
      cp.createAlertRule("r", "m", "contains", 1.0)
    }
    intercept[ControlPlane.Invalid] { cp.createAlertRule("r", "", "gt", 1.0) }
    intercept[ControlPlane.Invalid] {
      cp.createAlertRule("r", "m", "gt", 1.0, durationSeconds = -1L)
    }
    intercept[ControlPlane.Invalid] {
      cp.createAlertRule("r", "m", "gt", 1.0, routes = Seq(("", true, 0L)))
    }
    // routes reference registered channels (the reference's FK)
    intercept[ControlPlane.NotFound] {
      cp.createAlertRule("r", "m", "gt", 1.0, routes = Seq(("ghost", true, 0L)))
    }
    // '|' is the fingerprint separator — a name carrying it would fire
    // without ever recording instances or notifications
    intercept[ControlPlane.Invalid] { cp.createAlertRule("a|b", "m", "gt", 1.0) }
    val email = cp.createChannel("email-ops", "email",
      config = Map("to" -> "ops@example.com"))
    val slack = cp.createChannel("slack-ops", "slack")
    val pager = cp.createChannel("pager-ops", "pagerduty")
    intercept[ControlPlane.Invalid] { cp.createChannel("x", "carrier-pigeon") }
    intercept[ControlPlane.Conflict] { cp.createChannel("email-ops", "email") }
    val high = cp.createAlertRule("high", "avg_value", "gt", 50.0,
      durationSeconds = 60L, severity = "critical",
      routes = Seq((email.id, true, 300L), (slack.id, false, 60L)))
    // a routed channel cannot be deleted; an unrouted one can
    intercept[ControlPlane.Conflict] { cp.deleteChannel(email.id) }
    cp.createAlertRule("floor", "avg_value", "gte", 10.0)
    intercept[ControlPlane.Conflict] {
      cp.createAlertRule("high", "avg_value", "gt", 1.0)
    }
    intercept[ControlPlane.NotFound] { cp.getAlertRule("ghost") }
    // full PUT keeps route ids for surviving (channel, interval) pairs —
    // notifier state and history key on them
    val routeId = high.routes.head.id
    val updated = cp.updateAlertRule(high.id, "high", "avg_value", "gt",
      75.0, 120L, "desc", "critical", enabled = true,
      routes = Seq((email.id, false, 300L), (pager.id, true, 30L)))
    assert(updated.threshold === 75.0)
    assert(updated.routes.find(_.channel == email.id).get.id === routeId)
    assert(!updated.routes.find(_.channel == email.id).get.enabled)
    assert(updated.routes.find(_.channel == pager.id).get.id !== routeId)
    intercept[ControlPlane.Invalid] {
      cp.updateAlertRule(high.id, "a|b", "avg_value", "gt", 75.0, 120L,
        "desc", "critical", enabled = true, routes = Nil)
    }
    // a PUT carrying two routes with the SAME (channel, interval) must
    // produce two distinct route ids — the surviving id is consumed once
    val dup = cp.updateAlertRule(high.id, "high", "avg_value", "gt",
      75.0, 120L, "desc", "critical", enabled = true,
      routes = Seq((email.id, true, 300L), (email.id, false, 300L)))
    assert(dup.routes.size === 2 &&
      dup.routes.map(_.id).distinct.size === 2)
    assert(dup.routes.map(_.id).contains(routeId))
    // restore the shape the following assertions pin
    cp.updateAlertRule(high.id, "high", "avg_value", "gt",
      75.0, 120L, "desc", "critical", enabled = true,
      routes = Seq((email.id, false, 300L), (pager.id, true, 30L)))
    // disabled rules drop out of the evaluator's set; route intervals
    // convert to millis
    cp.createAlertRule("noise", "avg_value", "eq", -1.0, enabled = false)
    val (rules, routes) = cp.evaluatorRules()
    assert(rules.map(_.name).sorted === Seq("floor", "high"))
    assert(rules.find(_.name == "high").get.threshold === 75.0)
    assert(routes.map(r => (r.rule, r.channel, r.enabled, r.repeatIntervalMs))
      .toSet === Set(("high", email.id, false, 300000L),
        ("high", pager.id, true, 30000L)))
    // persistence: a reopened store sees identical rules
    val cp2 = plane(dir)
    assert(cp2.listAlertRules().map(r =>
      (r.name, r.op, r.threshold, r.enabled)).toSet ===
      Set(("high", "gt", 75.0, true), ("floor", "gte", 10.0, true),
        ("noise", "eq", -1.0, false)))
    assert(cp2.getAlertRule(high.id).routes.map(_.channel).toSet ===
      Set(email.id, pager.id))
    cp2.deleteAlertRule(high.id)
    assert(plane(dir).listAlertRules().map(_.name).sorted ===
      Seq("floor", "noise"))
  }

  test("alert instances, audit history, acknowledgement, silences — machine transitions recorded") {
    val dir = freshDir()
    @volatile var now = 10000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    val rule = cp.createAlertRule("high", "avg_value", "gt", 50.0)
    // fire: creates the instance + a fired history row
    val a = cp.recordAlertFired(rule.id, "high|s1", Some(61.5), now)
    assert(a.status === "firing" && a.currentValue === Some(61.5))
    intercept[ControlPlane.NotFound] {
      cp.recordAlertFired("ghost", "x|y", None, now)
    }
    // a re-fire updates the SAME instance, appends history
    now += 1000
    val a2 = cp.recordAlertFired(rule.id, "high|s1", Some(70.0), now)
    assert(a2.id === a.id && a2.currentValue === Some(70.0))
    cp.recordAlertNotification("high|s1", "ch-1", "fired", now)
    // acknowledge: only firing instances, recorded with actor
    val ack = cp.acknowledgeAlert(a.id, "oncall@x")
    assert(ack.acknowledgedBy === "oncall@x" && ack.acknowledgedAtMs.isDefined)
    // resolve by absence; a resolved instance refuses acknowledgement
    now += 1000
    assert(cp.recordAlertResolved("high|s1", now).exists(_.status == "resolved"))
    assert(cp.recordAlertResolved("high|s1", now).isEmpty) // idempotent
    intercept[ControlPlane.Conflict] { cp.acknowledgeAlert(a.id, "x") }
    // a NEW fire under the same fingerprint is a fresh instance
    val b = cp.recordAlertFired(rule.id, "high|s1", Some(90.0), now)
    assert(b.id !== a.id)
    assert(b.status === "firing")
    assert(cp.alertSummary() === Map("firing" -> 1L, "resolved" -> 1L))
    assert(cp.listAlertInstances(Some("firing")).map(_.id) === Seq(b.id))
    // the audit trail holds every transition in order
    assert(cp.listAlertHistory(a.id).map(_.eventType) ===
      Seq("fired", "fired", "notification_sent", "acknowledged", "resolved"))
    intercept[ControlPlane.NotFound] { cp.listAlertHistory("ghost") }
    // silences: window + matcher semantics, validation
    intercept[ControlPlane.Invalid] {
      cp.createSilence(Map.empty, now, now + 10, "x")
    }
    intercept[ControlPlane.Invalid] {
      cp.createSilence(Map("rule" -> "high"), now + 10, now, "x")
    }
    val sil = cp.createSilence(Map("rule" -> "high", "series" -> "s1"),
      now - 1, now + 60000, "oncall@x", "deploy window")
    assert(cp.silenced(Map("rule" -> "high", "series" -> "s1"), now))
    assert(!cp.silenced(Map("rule" -> "high", "series" -> "s2"), now))
    assert(!cp.silenced(Map("rule" -> "high", "series" -> "s1"), now + 70000))
    // persistence: instances, history, and silences all reopen
    val cp2 = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    assert(cp2.alertSummary() === Map("firing" -> 1L, "resolved" -> 1L))
    assert(cp2.listAlertHistory(a.id).size === 5)
    assert(cp2.getSilence(sil.id).comment === "deploy window")
    cp2.deleteSilence(sil.id)
    intercept[ControlPlane.NotFound] { cp2.getSilence(sil.id) }
  }

  test("scaling policies: CRUD, for-duration evaluation, cooldown, history, persistent state") {
    val dir = freshDir()
    @volatile var now = 100000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    // validation family (the reference's field errors)
    intercept[ControlPlane.Invalid] {
      cp.createScalingPolicy("p", "warp-drive", 1, 4)
    }
    intercept[ControlPlane.Invalid] {
      cp.createScalingPolicy("p", "cdc-worker", 5, 4)
    }
    intercept[ControlPlane.Invalid] {
      cp.createScalingPolicy("p", "cdc-worker", 0, 0)
    }
    intercept[ControlPlane.Invalid] {
      cp.createScalingPolicy("p", "cdc-worker", 1, 4,
        scaleUpRules = Seq(("lag", "gt", 10.0, 0L, 0)))
    }
    intercept[ControlPlane.Invalid] {
      cp.createScalingPolicy("p", "cdc-worker", 1, 4,
        scaleUpRules = Seq(("lag", "contains", 10.0, 0L, 1)))
    }
    val p = cp.createScalingPolicy("workers", "cdc-worker", 1, 4,
      cooldownSeconds = 60L,
      scaleUpRules = Seq(("philotes_cdc_lag_seconds", "gt", 10.0, 30L, 2)),
      scaleDownRules = Seq(("philotes_cdc_lag_seconds", "lt", 1.0, 0L, 1)))
    intercept[ControlPlane.Conflict] {
      cp.createScalingPolicy("workers", "cdc-worker", 1, 4)
    }
    assert(cp.getScalingPolicyState(p.id).currentReplicas === 1)
    // for-duration: the first over-threshold tick ARMS, never fires
    val lag = "philotes_cdc_lag_seconds"
    val d1 = cp.evaluateScalingPolicy(p.id, Map(lag -> 42.0))
    assert(!d1.shouldExecute)
    now += 30000L
    val d2 = cp.evaluateScalingPolicy(p.id, Map(lag -> 42.0))
    assert(d2.shouldExecute && d2.desiredReplicas === 3) // 1 + scale_by 2
    assert(cp.getScalingPolicyState(p.id).currentReplicas === 3)
    // cooldown vetoes the very next over-threshold tick
    now += 1000L
    val d3 = cp.evaluateScalingPolicy(p.id, Map(lag -> 42.0))
    assert(!d3.shouldExecute && d3.reason.contains("cooldown"))
    // past cooldown, low lag steps DOWN by one
    now += 60000L
    val d4 = cp.evaluateScalingPolicy(p.id, Map(lag -> 0.5))
    assert(d4.shouldExecute && d4.desiredReplicas === 2)
    // only EXECUTED decisions reach history
    assert(cp.listScalingHistory(Some(p.id))
      .map(e => (e.action, e.fromReplicas, e.toReplicas)) ===
      Seq(("scale-up", 1, 3), ("scale-down", 3, 2)))
    // disabled policies refuse evaluation; enable restores it
    cp.setScalingPolicyEnabled(p.id, enabled = false)
    intercept[ControlPlane.Conflict] {
      cp.evaluateScalingPolicy(p.id, Map.empty)
    }
    cp.setScalingPolicyEnabled(p.id, enabled = true)
    // full PUT keeps the surviving rule's id (pending clocks key on it)
    val upId = p.scaleUpRules.head.id
    val upd = cp.updateScalingPolicy(p.id, "workers", "cdc-worker", 1, 8,
      60L, scaleToZero = Some(false), enabled = Some(true),
      Seq((lag, "gt", 10.0, 30L, 2)), Nil)
    assert(upd.scaleUpRules.head.id === upId &&
      upd.scaleDownRules.isEmpty && upd.maxReplicas === 8)
    // state + history survive a reopen (cooldowns outlive restarts)
    val cp2 = new ControlPlane(dir, connTest = _ => Right(1L),
      clock = () => now)
    assert(cp2.getScalingPolicyState(p.id).currentReplicas === 2)
    assert(cp2.listScalingHistory().size === 2)
    // arm a pending clock, then PUT dropping the rule with a LOWERED
    // ceiling: the orphaned clock is pruned and the persisted width
    // clamps into the new bounds (no rule could move it back inside)
    now += 120000L
    cp2.evaluateScalingPolicy(p.id, Map(lag -> 42.0)) // arms the 30s rule
    assert(cp2.getScalingPolicyState(p.id).pendingSince.size === 1)
    cp2.updateScalingPolicy(p.id, "workers", "cdc-worker", 1, 1, 60L,
      scaleToZero = None, enabled = None, Nil, Nil)
    val stAfter = cp2.getScalingPolicyState(p.id)
    assert(stAfter.pendingSince.isEmpty && stAfter.currentReplicas === 1)
    cp2.deleteScalingPolicy(p.id)
    // the audit trail survives deletion in BOTH history views
    assert(cp2.listScalingHistory(Some(p.id)).size === 2)
    assert(cp2.listScalingHistory().size === 2)
    assert(new ControlPlane(dir, connTest = _ => Right(1L))
      .listScalingPolicies().isEmpty)
  }

  test("users + sessions: hash at rest, expiry, persistence, deactivation, login lockout") {
    val dir = freshDir()
    @volatile var now = 5000000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    // validation family
    intercept[ControlPlane.Invalid] {
      cp.registerFirstAdmin("not-an-email", "longenough")
    }
    intercept[ControlPlane.Invalid] {
      cp.registerFirstAdmin("a@b.example", "short")
    }
    val (u, tok, sess) = cp.registerFirstAdmin("a@b.example", "longenough", "A")
    assert(u.role === "admin" && tok.startsWith("graft_sess_") &&
      sess.expiresAtMs === now + ControlPlane.DefaultSessionTtlMs)
    intercept[ControlPlane.Conflict] {
      cp.registerFirstAdmin("other@b.example", "longenough")
    }
    // neither the password nor the session plaintext is on disk
    val users = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "users.json"))
    val sessFile = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "sessions.json"))
    assert(!users.contains("longenough") && !sessFile.contains(tok))
    // login: unknown email and wrong password are the SAME 401 class
    intercept[ControlPlane.Unauthorized] {
      cp.loginUser("ghost@b.example", "longenough")
    }
    intercept[ControlPlane.Unauthorized] {
      cp.loginUser("a@b.example", "wrong-password")
    }
    val (u2, tok2, _) = cp.loginUser("a@b.example", "longenough")
    assert(u2.lastLoginAtMs === Some(now))
    // sessions survive a reopen (hash lookup, not memory)
    val cp2 = new ControlPlane(dir, connTest = _ => Right(1L),
      clock = () => now)
    assert(cp2.validateSession(tok2).exists(_._2.email === "a@b.example"))
    // expiry refuses, and expired rows are pruned at the next mint
    now += ControlPlane.DefaultSessionTtlMs + 1L
    assert(cp2.validateSession(tok2).isEmpty)
    val (_, tok3, _) = cp2.loginUser("a@b.example", "longenough")
    assert(cp2.validateSession(tok3).isDefined)
    // deactivation refuses login (403 BEFORE the password check — no
    // password oracle for disabled accounts) and kills live sessions
    cp2.setUserActive(u.id, active = false)
    intercept[ControlPlane.Forbidden] {
      cp2.loginUser("a@b.example", "wrong-password-too")
    }
    intercept[ControlPlane.Forbidden] {
      cp2.loginUser("a@b.example", "longenough")
    }
    assert(cp2.validateSession(tok3).isEmpty)
    // ...and survives a reopen
    val cp3 = new ControlPlane(dir, connTest = _ => Right(1L),
      clock = () => now)
    intercept[ControlPlane.Forbidden] {
      cp3.loginUser("a@b.example", "longenough")
    }
    cp3.setUserActive(u.id, active = true)
    // lockout engages on FAILURE: five consecutive wrong passwords
    // lock the email out — even the CORRECT password refuses during
    // the window; past it, a successful login resets the counter
    (1 to 5).foreach { _ =>
      intercept[ControlPlane.Unauthorized] {
        cp3.loginUser("a@b.example", "wrong-password")
      }
    }
    intercept[ControlPlane.TooManyRequests] {
      cp3.loginUser("a@b.example", "longenough")
    }
    now += 60001L
    assert(cp3.loginUser("a@b.example", "longenough")._1.email ===
      "a@b.example")
    // per-user session cap: a login-per-request client keeps only the
    // newest MaxSessionsPerUser sessions — the oldest stops validating
    val toks = (1 to ControlPlane.MaxSessionsPerUser + 1).map { _ =>
      now += 1L
      cp3.loginUser("a@b.example", "longenough")._2
    }
    assert(cp3.validateSession(toks.head).isEmpty &&
      cp3.validateSession(toks(1)).isDefined &&
      cp3.validateSession(toks.last).isDefined)
  }

  test("savings derivation property: random zero/wake walks reconstruct exact totals") {
    // drive real zero/wake transitions with an injected clock and a
    // seeded random walk; the derived savings must equal the
    // independently-accumulated ground truth exactly (integer seconds)
    val rnd = new scala.util.Random(421666L)
    for (trial <- 1 to 8) {
      val dir = freshDir()
      @volatile var now = 86400000L * (200 + trial)
      val cp = new ControlPlane(dir, connTest = _ => Right(1L),
        clock = () => now)
      val p = cp.createScalingPolicy(s"w$trial", "cdc-worker", 2, 4,
        cooldownSeconds = 0L, scaleToZero = true)
      cp.recordScalingActivity(p.id)
      var expectedZeroMs = 0L
      var zeroedAt = 0L
      var isZero = false
      for (_ <- 1 to 20) {
        now += 1000L + rnd.nextInt(10000000) // up to ~2.8h steps
        if (isZero) {
          expectedZeroMs += now - zeroedAt
          assert(cp.wakeScalingPolicy(p.id, "manual").status === "completed")
          isZero = false
        } else {
          assert(cp.idleScaleToZeroTick(idleThresholdMs = 0L,
            keepAliveWindowMs = 0L) === Seq(p.id))
          zeroedAt = now; isZero = true
        }
      }
      now += 1000L + rnd.nextInt(10000000)
      if (isZero) expectedZeroMs += now - zeroedAt // open interval
      val summary = cp.scalingSavingsSummary(hourlyCostCents = 3600)
      assert(summary.size === 1)
      val daily = cp.scalingCostSavings(p.id,
        days = 3650, hourlyCostCents = 3600)
      // seconds and cents both truncate PER DAY ROW (an interval
      // crossing midnight floors each side), so the reconstruction is
      // exact up to one unit per daily row — never more
      assert((summary.head.zeroSeconds - expectedZeroMs / 1000L).abs
        <= daily.size, s"trial $trial: zero seconds diverged")
      assert(daily.map(_.zeroSeconds).sum === summary.head.zeroSeconds)
      assert(daily.map(_.savingsCents).sum === summary.head.savingsCents)
      val exactCents = 2L * expectedZeroMs * 3600 / 3600000L
      assert((summary.head.savingsCents - exactCents).abs <= daily.size,
        s"trial $trial: cents drifted beyond per-day truncation")
    }
  }

  test("activity pings persist throttled; transitions always persist") {
    val dir = freshDir()
    @volatile var now = 7000000L
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    val p = cp.createScalingPolicy("w", "cdc-worker", 1, 4,
      scaleToZero = true)
    cp.recordScalingActivity(p.id) // first sight: persists
    val t0 = now
    now += 5000L
    cp.recordScalingActivity(p.id) // within the window: memory-only
    assert(cp.getIdleState(p.id).lastActivityAtMs === now)
    // a reopen sees the PERSISTED timestamp (bounded freshness loss)
    val cp2 = new ControlPlane(dir, connTest = _ => Right(1L),
      clock = () => now)
    assert(cp2.getIdleState(p.id).lastActivityAtMs === t0)
    // past the persist interval the ping writes through
    now += ControlPlane.ActivityPersistIntervalMs
    cp.recordScalingActivity(p.id)
    val cp3 = new ControlPlane(dir, connTest = _ => Right(1L),
      clock = () => now)
    assert(cp3.getIdleState(p.id).lastActivityAtMs === now)
  }

  test("wake/idle/savings: idle tick zeroes, wake restores width with cooldown, savings derive from history") {
    val dir = freshDir()
    val t0 = 86400000L * 100 // day 100, midnight UTC
    @volatile var now = t0
    val cp = new ControlPlane(dir, connTest = _ => Right(1L), clock = () => now)
    val p = cp.createScalingPolicy("workers", "cdc-worker", 2, 4,
      cooldownSeconds = 60L, scaleToZero = true,
      scaleUpRules = Seq(("lag", "gt", 10.0, 0L, 1)))
    // no idle state yet: the view 404s, and the tick NEVER zeroes a
    // policy with no recorded activity (absence of signal != idleness)
    intercept[ControlPlane.NotFound] { cp.getIdleState(p.id) }
    assert(cp.idleScaleToZeroTick() === Nil)
    cp.recordScalingActivity(p.id)
    assert(cp.getIdleState(p.id).lastActivityAtMs === t0)
    // under the 30m default threshold: still running
    now = t0 + 600000L
    assert(cp.idleScaleToZeroTick() === Nil)
    // past it: zeroed, marked, recorded
    now = t0 + 2100000L // +35 min
    assert(cp.idleScaleToZeroTick() === Seq(p.id))
    assert(cp.getScalingPolicyState(p.id).currentReplicas === 0)
    val idle0 = cp.getIdleState(p.id)
    assert(idle0.isScaledToZero && idle0.scaledToZeroAtMs === Some(now))
    assert(cp.listScaledToZero().map(_.policyId) === Seq(p.id))
    assert(cp.idleScaleToZeroTick() === Nil) // already zero: no-op
    // one hour at zero, then wake: width = min_replicas, cooldown set
    now = t0 + 5700000L // +95 min
    val w = cp.wakeScalingPolicy(p.id, "manual")
    assert(w.status === "completed" && w.previousReplicas === 0 &&
      w.targetReplicas === 2)
    val idle1 = cp.getIdleState(p.id)
    assert(!idle1.isScaledToZero && idle1.lastWakeAtMs === Some(now) &&
      idle1.wakeReason === Some("manual"))
    assert(cp.listScaledToZero() === Nil)
    // the wake started the cooldown clock: an immediately following
    // over-threshold evaluation is vetoed
    now += 1000L
    val d = cp.evaluateScalingPolicy(p.id, Map("lag" -> 42.0))
    assert(!d.shouldExecute && d.reason.contains("cooldown"))
    // waking a running policy: completed no-op, NO history row
    val histBefore = cp.listScalingHistory(Some(p.id)).size
    val w2 = cp.wakeScalingPolicy(p.id, "manual")
    assert(w2.status === "completed" && w2.previousReplicas === 2 &&
      w2.message.contains("already running"))
    assert(cp.listScalingHistory(Some(p.id)).size === histBefore)
    intercept[ControlPlane.Invalid] { cp.wakeScalingPolicy(p.id, "because") }
    // keep-alive window after a wake vetoes re-zeroing (anti-flap),
    // even with the idle threshold forced to zero
    assert(cp.idleScaleToZeroTick(idleThresholdMs = 0L) === Nil)
    now = t0 + 6001000L // 5 min past the wake
    assert(cp.idleScaleToZeroTick(idleThresholdMs = 0L) === Seq(p.id))
    // savings derive from the history rows: the closed zero interval
    // (35..95 min = 3600 s) plus the open one (599 s), the idle
    // stretch wake..re-zero (301 s); both zeroings took TWO replicas
    // away, so at 3600 cents/replica-hour cents == 2 x zero seconds
    now = t0 + 6600000L // +110 min
    val daily = cp.scalingCostSavings(p.id, days = 1, hourlyCostCents = 3600)
    assert(daily === Seq(ControlPlane.DailySavings(
      java.time.LocalDate.ofEpochDay(100).toString, 301L, 4199L, 8398L)))
    // the summary sums the SAME daily derivation — never disagrees
    val summary = cp.scalingSavingsSummary(hourlyCostCents = 3600)
    assert(summary === Seq(ControlPlane.PolicySavings(p.id, 301L, 4199L, 8398L)))
    // wake-all with ABSENT ids wakes exactly the zero-width policies;
    // an EXPLICIT empty list is a no-op; an invalid reason is 400 even
    // when the target set would be empty; a listed running policy
    // reports already-running; a ghost id fails inside the batch
    val p2 = cp.createScalingPolicy("other", "cdc-worker", 1, 2)
    cp.recordScalingActivity(p2.id) // idle row exists for the delete pin
    val all = cp.wakeScalingPolicies(None, "api_request")
    assert(all.map(r => (r.policyId, r.status, r.previousReplicas)) ===
      Seq((p.id, "completed", 0)))
    assert(cp.wakeScalingPolicies(Some(Nil), "manual") === Nil)
    intercept[ControlPlane.Invalid] {
      cp.wakeScalingPolicies(None, "bogus")
    }
    val mixed = cp.wakeScalingPolicies(Some(Seq(p2.id, "ghost")), "api_request")
    assert(mixed.map(_.status) === Seq("completed", "failed") &&
      mixed.head.previousReplicas === 1)
    // the idle tick never bypasses a live cooldown (the wake-all just
    // started one), even with both thresholds forced to zero
    assert(cp.idleScaleToZeroTick(idleThresholdMs = 0L,
      keepAliveWindowMs = 0L) === Nil)
    now += 60001L // cooldown over
    assert(cp.idleScaleToZeroTick(idleThresholdMs = 0L,
      keepAliveWindowMs = 0L) === Seq(p.id))
    // idle/wake state survives a reopen; a deleted policy's idle row
    // goes with it (no orphans accreting in idle_state.json)
    cp.deleteScalingPolicy(p2.id)
    val cp2 = new ControlPlane(dir, connTest = _ => Right(1L),
      clock = () => now)
    val reloaded = cp2.getIdleState(p.id)
    assert(reloaded.wakeReason === Some("api_request") &&
      reloaded.isScaledToZero)
    val idleFile = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "idle_state.json"))
    assert(idleFile.contains(p.id) && !idleFile.contains(p2.id))
  }
}
