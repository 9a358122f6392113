package graft.api

import graft.observe.{Alerts, Metrics, Webhooks}

/** The reference's alerting MANAGER loop (ref internal/alerting/
  * manager.go:84-199 Start/run/evaluateRules): every interval, load the
  * ENABLED rules from the control store, poll each rule's metric from
  * the metric source, advance the for-duration machine, record the
  * transitions as alert instances + audit history, and deliver the
  * cycle's notifications through their channels — webhook channels
  * POST the reference's payload shape ([[Webhooks]]), silenced
  * notifications are suppressed but still audited as suppressed.
  *
  * The machine state lives in memory exactly like the reference's
  * (pendingAlerts / firing instance set are process state; the STORE
  * holds instances and history, which is what survives a restart —
  * after one, series still over threshold re-fire within two cycles).
  *
  * `metricSource` maps a rule's metric_name to its (series, value)
  * rows this cycle. The default polls the in-process Prometheus
  * registry: a metric named like the exposition series (e.g.
  * `philotes_cdc_lag_seconds`) evaluates against its current value as
  * the single series `_global` — the reference evaluates PromQL
  * against its metrics backend the same way, one Eval per returned
  * series. */
final class AlertManager(cp: ControlPlane,
                         metricSource: String => Seq[(String, Double)] =
                           AlertManager.registryMetricSource(Metrics.global),
                         clock: () => Long = () => System.currentTimeMillis(),
                         intervalMs: Long = 15000L,
                         deliverWebhooks: Boolean = true)
  extends AutoCloseable {

  @volatile private var machine = Alerts.MachineState.empty
  @volatile private var notifier = Alerts.NotifierState.empty
  private val daemon =
    new TickerDaemon("graft-alert-manager", intervalMs, () => { tick(); () })

  /** One delivered-or-suppressed notification from the last tick. */
  final case class Outcome(note: Alerts.Notification, silenced: Boolean,
                           delivered: Boolean, error: Option[String])

  private def labelsOf(fingerprint: String): Map[String, String] = {
    val (rule, series) = fingerprint.span(_ != '|')
    Map("rule" -> rule, "series" -> series.stripPrefix("|"))
  }

  /** One evaluation cycle — the reference's evaluateRules body. Safe
    * to call directly (specs, manual ticks); the daemon just calls it
    * on a timer. */
  def tick(): Seq[Outcome] = {
    val nowMs = clock()
    val stored = cp.listAlertRules().filter(_.enabled)
    val ruleIdOf = stored.map(r => r.name -> r.id).toMap
    val valueOfFp = scala.collection.mutable.Map.empty[String, Double]
    val evals = stored.flatMap { r =>
      metricSource(r.metricName).map { case (series, v) =>
        val fp = s"${r.name}|$series"
        valueOfFp(fp) = v
        Alerts.Eval(fp, v, Alerts.compareScalar(v, r.op, r.threshold),
          r.durationSeconds * 1000L)
      }
    }
    val (_, routes) = cp.evaluatorRules()
    val (m2, n2, events, refires, notes) = Alerts.notifyCycleFull(
      machine, notifier, evals, fp => labelsOf(fp)("rule"), routes, nowMs)
    machine = m2; notifier = n2
    // transitions → store (instance upserts + audit trail), route-
    // independent: an unrouted rule's fire still records
    events.foreach {
      case Alerts.Event(fp, "fired") =>
        ruleIdOf.get(labelsOf(fp)("rule")).foreach(rid =>
          cp.recordAlertFired(rid, fp, valueOfFp.get(fp), nowMs))
      case Alerts.Event(fp, "resolved") =>
        cp.recordAlertResolved(fp, nowMs); ()
      case _ => ()
    }
    refires.distinct.foreach { fp =>
      ruleIdOf.get(labelsOf(fp)("rule")).foreach(rid =>
        cp.recordAlertFired(rid, fp, valueOfFp.get(fp), nowMs))
    }
    // notifications: silences and DISABLED channels eat theirs (both
    // audited as suppressed); the rest deliver — webhook channels
    // POST, other channel types are recorded as delivered (their
    // transports live outside this process)
    val channels = cp.listChannels()
    val channelEnabled: String => Boolean = ch =>
      channels.find(_.id == ch).forall(_.enabled)
    val (muted, unmuted) = notes.partition(n =>
      cp.silenced(labelsOf(n.fingerprint), nowMs))
    val (live, disabled) = unmuted.partition(n => channelEnabled(n.channel))
    val urlOf: String => Option[String] = ch =>
      channels.find(c => c.id == ch && c.typ == "webhook")
        .flatMap(_.config.get("url"))
    val deliveries: Map[Int, Webhooks.Delivery] =
      if (!deliverWebhooks) Map.empty
      else {
        val posts = live.zipWithIndex.filter(li => urlOf(li._1.channel).isDefined)
        Webhooks.deliver(posts.map(_._1), urlOf)
          .zip(posts.map(_._2)).map(_.swap).toMap
      }
    val outcomes = live.zipWithIndex.map { case (n, i) =>
      deliveries.get(i) match {
        case Some(d) =>
          if (d.delivered)
            cp.recordAlertNotification(n.fingerprint, n.channel, n.event, nowMs)
          Outcome(n, silenced = false, delivered = d.delivered, d.error)
        case None =>
          cp.recordAlertNotification(n.fingerprint, n.channel, n.event, nowMs)
          Outcome(n, silenced = false, delivered = true, None)
      }
    } ++ muted.map { n =>
      cp.recordAlertSuppressed(n.fingerprint, n.channel, n.event,
        "silenced", nowMs)
      Outcome(n, silenced = true, delivered = false, None)
    } ++ disabled.map { n =>
      cp.recordAlertSuppressed(n.fingerprint, n.channel, n.event,
        "channel disabled", nowMs)
      Outcome(n, silenced = false, delivered = false,
        Some("channel disabled"))
    }
    outcomes
  }

  /** Start the daemon (idempotent). */
  def start(): Unit = daemon.start()

  override def close(): Unit = daemon.close()
}

object AlertManager {
  /** Metric source over a [[Metrics.Registry]]: the rule's metric_name
    * is the exposition series name; its current value is one `_global`
    * series. Unknown names evaluate nothing (the reference's PromQL
    * returning no series). */
  def registryMetricSource(reg: Metrics.Registry): String => Seq[(String, Double)] =
    name => reg.snapshot().get(name).map(v => ("_global", v)).toSeq
}
