package graft.observe

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.control.NonFatal

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Alert notification DELIVERY over HTTP webhooks (ref internal/
  * alerting/channels/webhook.go:16-151 WebhookChannel + manager.go:19-62
  * the notifier channel factory): [[Alerts.notifyCycle]] decides WHAT to
  * deliver; this module performs the delivery — a JSON POST per
  * notification with the reference's payload shape, 2xx = delivered,
  * anything else (or a transport error) = a failed delivery the caller
  * may retry. Delivery is at-least-once by design: the notifier state
  * only suppresses repeats AFTER a successful send is recorded by the
  * caller, mirroring the reference's UpdateLastNotified placement. */
object Webhooks {

  /** Outcome of one POST. `status` is the HTTP code, 0 = transport
    * error (connect refused, timeout). */
  final case class Delivery(note: Alerts.Notification, url: String,
                            status: Int, delivered: Boolean,
                            error: Option[String] = None)

  /** The reference's WebhookPayload (webhook.go:25-68): version,
    * timestamp, event, alert{fingerprint, status}, rule{name}, and
    * channel{id, type}. Timestamp carries the notification's own
    * cycle clock (atMs) so replays are deterministic. */
  def payloadJson(n: Alerts.Notification): String = {
    val status = if (n.event == "resolved") "resolved" else "firing"
    JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JString("1.0"),
      "timestamp" -> JInt(BigInt(n.atMs)),
      "event" -> JString(n.event),
      "alert" -> JObject(
        "fingerprint" -> JString(n.fingerprint),
        "status" -> JString(status)),
      "rule" -> JObject("name" -> JString(n.rule)),
      "channel" -> JObject(
        "id" -> JString(n.channel),
        "type" -> JString("webhook")))))
  }

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** POST one payload; 2xx accepted (webhook.go:139-142). */
  def post(url: String, body: String,
           timeoutMs: Long = 30000L): (Int, Option[String]) =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .header("User-Agent", "Graft-Alerting/1.0")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      val err = if (resp.statusCode() < 200 || resp.statusCode() >= 300)
        Some(s"webhook returned non-success status ${resp.statusCode()}: " +
          resp.body().take(200))
      else None
      (resp.statusCode(), err)
    } catch {
      case NonFatal(e) => (0, Some(String.valueOf(e.getMessage)))
    }

  /** Deliver a cycle's notifications through their channels' webhook
    * URLs. A channel with no configured URL is a config error surfaced
    * as a failed delivery (the reference's channel factory fails
    * channel construction loudly, manager.go:40-55).
    *
    * Channels deliver CONCURRENTLY; within one channel the notifyCycle
    * emission order is preserved (the only ordering that matters — a
    * resolve must not overtake its fire on the same channel). A hung
    * endpoint therefore stalls only its own channel instead of turning
    * a 30 s timeout into a serial outage amplifier for every channel
    * behind it. The returned Seq keeps the input order.
    *
    * `maxWaitMs` bounds the WHOLE cycle: a channel with many
    * notifications against a slow-but-not-timing-out endpoint must not
    * hold the alert loop hostage (per-POST timeouts alone bound one
    * send, not N in sequence). Sends still in flight at the deadline
    * are reported as failed deliveries ("deadline exceeded"), so the
    * caller's at-least-once retry picks them up next cycle — delivery
    * remains at-least-once, never silently dropped. */
  def deliver(notes: Seq[Alerts.Notification],
              urlOf: String => Option[String],
              maxWaitMs: Long = 120000L): Seq[Delivery] = {
    def send(n: Alerts.Notification): Delivery = urlOf(n.channel) match {
      case None =>
        Delivery(n, "", 0, delivered = false,
          Some(s"channel ${n.channel} has no webhook url"))
      case Some(url) =>
        val (status, err) = post(url, payloadJson(n))
        Delivery(n, url, status, delivered = err.isEmpty, err)
    }
    val indexed = notes.zipWithIndex
    val byChannel = indexed.groupBy(_._1.channel).values.toSeq
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import scala.util.{Failure, Success}
    implicit val ec: ExecutionContext = ExecutionContext.global
    // blocking{}: the POSTs hold pool threads for up to the timeout —
    // without it, channels beyond global's parallelism queue behind a
    // hung endpoint, re-creating the serial stall this design prevents
    val futures = byChannel.map(ch => ch -> Future(
      scala.concurrent.blocking { ch.map { case (n, i) => (send(n), i) } }))
    // await each channel against the SHARED deadline — Future.sequence
    // would fail fast on one failed channel and misreport every other
    // in-flight channel as deadline-exceeded long before the deadline
    val deadlineNanos = System.nanoTime() + maxWaitMs * 1000000L
    futures.foreach { case (_, f) =>
      val remainMs = math.max(0L, (deadlineNanos - System.nanoTime()) / 1000000L)
      try Await.ready(f, remainMs.millis)
      catch { case _: java.util.concurrent.TimeoutException => () }
    }
    futures.flatMap { case (ch, f) =>
      f.value match {
        case Some(Success(res)) => res
        case Some(Failure(e)) => ch.map { case (n, i) =>
          (Delivery(n, "", 0, delivered = false,
            Some(s"delivery task failed: ${String.valueOf(e.getMessage)}")), i)
        }
        case None => ch.map { case (n, i) =>
          (Delivery(n, "", 0, delivered = false,
            Some(s"delivery deadline exceeded (${maxWaitMs} ms)")), i)
        }
      }
    }.sortBy(_._2).map(_._1)
  }
}
