package graft.observe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alert rule evaluation (ref internal/alerting/evaluator.go:62-243 +
  * operator table internal/alerting/types.go:54-113).
  *
  * The reference polls PromQL and compares each returned series against a
  * threshold with an operator in {gt, gte, lt, lte, eq}; series that
  * match are `firing`, others `resolved`. Here the metric source is any
  * DataFrame of (series, value) rows — typically an aggregation the
  * engine just computed — and the comparison is a codegen'd column
  * expression, so rule evaluation distributes with the data.
  */
object Alerts {

  final case class Rule(name: String, op: String, threshold: Double)

  /** ref types.go operator semantics */
  def compare(value: Column, op: String, threshold: Double): Column = op match {
    case "gt"  => value > threshold
    case "gte" => value >= threshold
    case "lt"  => value < threshold
    case "lte" => value <= threshold
    case "eq"  => value === threshold
    case other => throw new IllegalArgumentException(s"unknown operator: $other")
  }

  /** [[compare]] for a driver-side scalar (the manager loop's instant
    * compare over polled metric values — same operator table). */
  def compareScalar(value: Double, op: String, threshold: Double): Boolean =
    op match {
      case "gt"  => value > threshold
      case "gte" => value >= threshold
      case "lt"  => value < threshold
      case "lte" => value <= threshold
      case "eq"  => value == threshold
      case other => throw new IllegalArgumentException(s"unknown operator: $other")
    }

  /** Evaluate one rule against every series row of `metrics`
    * (seriesCol, valueCol). Output: series, value, rule, state. */
  def evaluate(metrics: DataFrame, seriesCol: String, valueCol: String,
               rule: Rule): DataFrame =
    metrics.select(
      col(seriesCol).as("series"),
      col(valueCol).as("value"),
      lit(rule.name).as("rule"),
      when(compare(col(valueCol), rule.op, rule.threshold), "firing")
        .otherwise("resolved").as("state"))

  /** Evaluate many rules (unioned — each rule sees every series). */
  def evaluateAll(metrics: DataFrame, seriesCol: String, valueCol: String,
                  rules: Seq[Rule]): DataFrame =
    rules.map(evaluate(metrics, seriesCol, valueCol, _))
      .reduce(_.unionAll(_))
      .orderBy(col("rule"), col("series"))

  // ---- for-duration state machine (ref internal/alerting/manager.go:
  // 201-330 handleFiring/handleNotFiring/fireAlert/checkForResolutions).
  // Pure clock-injected functions like Scaling.evaluatePolicy — the
  // per-series instant compare above feeds one [[Eval]] per series, and
  // [[cycle]] advances pending→firing→resolved across evaluation cycles.

  /** One series' evaluation this cycle; `fingerprint` is the reference's
    * GenerateFingerprint(rule, labels) — any stable series key. */
  final case class Eval(fingerprint: String, value: Double,
                        shouldFire: Boolean, durationMs: Long)

  /** Driver-side machine state: O(series), like the reference's
    * pendingAlerts map + firing instance set. */
  final case class MachineState(pendingSinceMs: Map[String, Long],
                                firing: Set[String])
  object MachineState { val empty: MachineState = MachineState(Map.empty, Set.empty) }

  final case class Event(fingerprint: String, event: String) // fired | resolved

  /** One evaluation cycle. Mirrors the reference manager EXACTLY,
    * including three deliberate behaviors its code exhibits (don't "fix"):
    *  1. a FIRST trigger only records pending and returns — even a
    *     zero-duration rule fires no earlier than the second cycle
    *     (manager.go:212-222: the !isPending branch returns nil);
    *  2. a series that recovers below threshold clears its pending clock
    *     but never resolves its firing instance — only series ABSENCE
    *     from the results resolves (handleNotFiring touches only
    *     pendingAlerts; checkForResolutions keys on seen fingerprints);
    *  3. absence leaves the pending clock untouched, and the
    *     existing-instance re-fire path returns before fireAlert's
    *     pending-delete line, so a firing series' pending clock survives
    *     and a reappearing series can fire from its old clock at once. */
  def cycle(state: MachineState, results: Seq[Eval], nowMs: Long)
  : (MachineState, Seq[Event]) = {
    var pending = state.pendingSinceMs
    var firing = state.firing
    val events = Seq.newBuilder[Event]
    results.foreach { r =>
      if (r.shouldFire) {
        pending.get(r.fingerprint) match {
          case None => pending += r.fingerprint -> nowMs
          case Some(since) if nowMs - since >= r.durationMs =>
            if (!firing(r.fingerprint)) {
              firing += r.fingerprint
              pending -= r.fingerprint
              events += Event(r.fingerprint, "fired")
            } // existing instance: re-notify only; pending deliberately kept
          case _ => () // still pending
        }
      } else pending -= r.fingerprint // firing instance deliberately untouched
    }
    val seen = results.map(_.fingerprint).toSet
    val resolved = firing.filterNot(seen)
    resolved.toSeq.sorted.foreach(fp => events += Event(fp, "resolved"))
    (MachineState(pending, firing -- resolved), events.result())
  }

  // ---- notification delivery as data (ref internal/alerting/
  // notifier.go:82-193 Notify/shouldNotify/updateLastNotified,
  // manager.go:280-369 fireAlert's existing-instance re-notify and
  // resolveAlert's ClearLastNotified-then-notify). The reference fans
  // each alert event out to the rule's enabled channel routes, gated per
  // (fingerprint, channel) by the route's repeat interval; here the
  // fan-out is a pure clock-injected function and the notifications ARE
  // the output table.

  /** One rule→channel route (ref AlertRoute: ChannelID,
    * RepeatIntervalSeconds, enabled). */
  final case class Route(rule: String, channel: String, enabled: Boolean,
                         repeatIntervalMs: Long)

  /** One delivered notification (ref Notification + the
    * notification_sent history row recordNotificationEvent writes). */
  final case class Notification(fingerprint: String, rule: String,
                                channel: String, event: String, atMs: Long)

  /** Notifier tracking state: (fingerprint, channel) → last successful
    * send (ref Notifier.lastNotified). */
  final case class NotifierState(lastNotifiedMs: Map[(String, String), Long])
  object NotifierState { val empty: NotifierState = NotifierState(Map.empty) }

  /** One evaluation cycle WITH notification fan-out — [[cycle]] plus the
    * notifier, mirroring the reference's delivery semantics exactly:
    *  - a NEW fire and every existing-instance RE-FIRE (firing entering
    *    the tick, pending clock past duration — fireAlert's existing
    *    branch) notify each enabled route, gated by shouldNotify:
    *    elapsed-since-last-send >= the route's repeat interval;
    *  - resolution CLEARS the fingerprint's tracking, then notifies
    *    every enabled route unconditionally (shouldNotify short-circuits
    *    resolved events) — and the successful send UPDATES the tracking
    *    again, so an immediate re-fire within the repeat interval is
    *    deliberately suppressed on slow channels (updateLastNotified
    *    runs for every event type in the reference);
    *  - disabled routes never notify, and a rule with no routes
    *    delivers nothing (Notify's early return). */
  def notifyCycle(machine: MachineState, notifier: NotifierState,
                  results: Seq[Eval], ruleOf: String => String,
                  routes: Seq[Route], nowMs: Long)
  : (MachineState, NotifierState, Seq[Notification]) = {
    val (m, n, _, _, notes) =
      notifyCycleFull(machine, notifier, results, ruleOf, routes, nowMs)
    (m, n, notes)
  }

  /** [[notifyCycle]] exposing the machine's raw transitions alongside
    * the notifications: `events` are the fires/resolves (route-
    * independent — an unrouted rule still transitions) and `refires`
    * the existing-instance re-fires. The manager loop records
    * instances from the events and deliveries from the notes. */
  def notifyCycleFull(machine: MachineState, notifier: NotifierState,
                      results: Seq[Eval], ruleOf: String => String,
                      routes: Seq[Route], nowMs: Long)
  : (MachineState, NotifierState, Seq[Event], Seq[String], Seq[Notification]) = {
    val (nextMachine, events) = cycle(machine, results, nowMs)
    val fired = events.collect { case Event(fp, "fired") => fp }.toSet
    // existing-instance re-fires: firing AND pending past duration
    // entering the tick (manager.go:289-294 — UpdateInstance + Notify)
    val refires = results.collect {
      case r if r.shouldFire && machine.firing(r.fingerprint) &&
        machine.pendingSinceMs.get(r.fingerprint)
          .exists(since => nowMs - since >= r.durationMs) => r.fingerprint
    }
    var last = notifier.lastNotifiedMs
    val notes = Seq.newBuilder[Notification]
    def send(fp: String, event: String): Unit = {
      val rule = ruleOf(fp)
      routes.filter(rt => rt.rule == rule && rt.enabled).foreach { rt =>
        val key = (fp, rt.channel)
        val due = event == "resolved" ||
          last.get(key).forall(t => nowMs - t >= rt.repeatIntervalMs)
        if (due) {
          notes += Notification(fp, rule, rt.channel, event, nowMs)
          last += key -> nowMs
        }
      }
    }
    // evaluation order first (fires and re-fires), then resolutions —
    // the manager's processEvaluation loop before checkForResolutions
    results.foreach { r =>
      if (fired(r.fingerprint) || refires.contains(r.fingerprint))
        send(r.fingerprint, "fired")
    }
    events.collect { case Event(fp, "resolved") => fp }.foreach { fp =>
      last = last.filterNot(_._1._1 == fp) // ClearLastNotified
      send(fp, "resolved")
    }
    (nextMachine, NotifierState(last), events, refires, notes.result())
  }
}
