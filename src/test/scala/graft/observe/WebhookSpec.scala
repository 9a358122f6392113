package graft.observe

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Webhook delivery against a REAL loopback HTTP receiver: payload
  * shape, 2xx acceptance, non-2xx and transport failures reported (not
  * swallowed), unrouted channels loud. */
class WebhookSpec extends AnyFunSuite {

  private def note(fp: String, event: String, ch: String = "c1") =
    Alerts.Notification(fp, "avg_rule", ch, event, 7000L)

  private def withReceiver(status: Int)(f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[String]()
    val srv = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      received.add(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      ex.sendResponseHeaders(status, -1L)
      ex.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/hook", received)
    finally srv.stop(0)
  }

  test("payload carries the reference WebhookPayload fields; 2xx delivers") {
    withReceiver(200) { (url, received) =>
      val out = Webhooks.deliver(
        Seq(note("pipeline_lag", "fired"), note("pipeline_lag", "resolved")),
        _ => Some(url))
      assert(out.forall(_.delivered))
      assert(out.map(_.status) === Seq(200, 200))
      val bodies = received.toArray.toSeq.map(b =>
        JsonMethods.parse(b.asInstanceOf[String]))
      assert(bodies.size === 2)
      val events = bodies.map(b => (b \ "event").asInstanceOf[JString].s).sorted
      assert(events === Seq("fired", "resolved"))
      bodies.foreach { b =>
        assert((b \ "version") === JString("1.0"))
        assert((b \ "alert" \ "fingerprint") === JString("pipeline_lag"))
        assert((b \ "rule" \ "name") === JString("avg_rule"))
        assert((b \ "channel" \ "type") === JString("webhook"))
        assert((b \ "timestamp") === JInt(BigInt(7000)))
      }
      // fired → firing status, resolved → resolved (webhook.go's status)
      val statusByEvent = bodies.map(b =>
        (b \ "event").asInstanceOf[JString].s ->
          (b \ "alert" \ "status").asInstanceOf[JString].s).toMap
      assert(statusByEvent === Map("fired" -> "firing", "resolved" -> "resolved"))
    }
  }

  test("non-2xx and transport failures are failed deliveries, not silent drops") {
    withReceiver(503) { (url, received) =>
      val out = Webhooks.deliver(Seq(note("x", "fired")), _ => Some(url))
      assert(out.size === 1 && !out.head.delivered)
      assert(out.head.status === 503)
      assert(out.head.error.exists(_.contains("non-success status 503")))
      assert(received.size === 1) // the POST did happen
    }
    // nothing listening → transport error, status 0
    val dead = Webhooks.deliver(Seq(note("x", "fired")),
      _ => Some("http://127.0.0.1:1/hook"))
    assert(dead.size === 1 && !dead.head.delivered && dead.head.status === 0)
  }

  test("a slow channel does not serialize other channels' deliveries") {
    val arrivals = new ConcurrentLinkedQueue[(String, Long)]()
    val srv = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      val ch = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).last
      if (ch == "slow") Thread.sleep(1000L)
      arrivals.add((ch, System.nanoTime()))
      ex.sendResponseHeaders(200, -1L)
      ex.close()
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      // emission order interleaves the channels: serial delivery would
      // make 'fast' wait ~1 s behind each 'slow' POST
      val notes = Seq(note("a", "fired", ch = "slow"),
        note("b", "fired", ch = "fast"),
        note("c", "fired", ch = "slow"),
        note("d", "fired", ch = "fast"))
      val out = Webhooks.deliver(notes, c => Some(s"$base/hook/$c"))
      assert(out.forall(_.delivered))
      assert(out.map(_.note.fingerprint) === Seq("a", "b", "c", "d")) // input order kept
      val byCh = arrivals.toArray.toSeq
        .map(_.asInstanceOf[(String, Long)]).groupBy(_._1)
      // both fast deliveries land before the SECOND slow one (which is
      // >= 2 s in on its own channel) — impossible under serial delivery
      assert(byCh("fast").map(_._2).max < byCh("slow").map(_._2).max,
        "fast channel was serialized behind the slow one")
    } finally srv.stop(0)
  }

  test("a channel with no webhook url fails loudly per delivery") {
    val out = Webhooks.deliver(Seq(note("x", "fired", ch = "ghost")), _ => None)
    assert(out.size === 1 && !out.head.delivered)
    assert(out.head.error.exists(_.contains("ghost has no webhook url")))
  }

  test("the cycle deadline bounds a hung channel; in-flight sends fail, fast ones deliver") {
    val srv = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    srv.createContext("/", (ex: HttpExchange) => {
      val ch = ex.getRequestURI.getPath.split('/').filter(_.nonEmpty).last
      // slow-but-not-timing-out endpoint: each POST answers eventually,
      // so only a WHOLE-CYCLE deadline can bound the loop
      if (ch == "hung") Thread.sleep(5000L)
      ex.sendResponseHeaders(200, -1L)
      ex.close()
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val notes = Seq(note("a", "fired", ch = "hung"),
        note("b", "fired", ch = "fast"))
      val t0 = System.nanoTime()
      val out = Webhooks.deliver(notes, c => Some(s"$base/hook/$c"),
        maxWaitMs = 1000L)
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(elapsedMs < 4000L, s"deadline did not bound the cycle: ${elapsedMs}ms")
      assert(out.map(_.note.fingerprint) === Seq("a", "b")) // input order kept
      assert(!out.head.delivered &&
        out.head.error.exists(_.contains("deadline exceeded")))
      assert(out(1).delivered, "the fast channel should have delivered in time")
    } finally srv.stop(0)
  }
}
