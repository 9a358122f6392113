package graft.observe

/** Auto-scaling DECISION engine (C2/C5): the reference's rule evaluator
  * and idle detector as pure functions over injected metric values and an
  * injected clock.
  *
  * The reference splits scaling into (a) decision logic — threshold
  * rules, cooldowns, for-duration conditions, replica clamping, idle
  * detection with a keep-alive window (ref internal/scaling/
  * evaluator.go:84-216, types.go:58-101,216-228,320-332, idle/
  * detector.go:29-46,205-218) — and (b) actuation against K8s/KEDA and
  * cloud node pools. Actuation is out of scope in this engine (SURVEY
  * §2.3: Spark clusters scale via dynamic allocation); the decision
  * layer is product logic and lives here, deterministic and replayable:
  * metric values come in as a Map (the reference queries Prometheus; our
  * metrics are data — [[Metrics.Registry.snapshot]] IS that map), time
  * comes in as a parameter.
  */
object Scaling {

  /** Comparison operator (ref types.go:58-101). */
  sealed abstract class Op(val name: String) {
    def evaluate(value: Double, threshold: Double): Boolean = this match {
      case Op.Gt  => value > threshold
      case Op.Lt  => value < threshold
      case Op.Gte => value >= threshold
      case Op.Lte => value <= threshold
      case Op.Eq  => value == threshold
    }
  }
  object Op {
    case object Gt extends Op("gt")
    case object Lt extends Op("lt")
    case object Gte extends Op("gte")
    case object Lte extends Op("lte")
    case object Eq extends Op("eq")
    val all: Seq[Op] = Seq(Gt, Lt, Gte, Lte, Eq)
    def parse(s: String): Op = all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"invalid operator: $s"))
  }

  /** One scaling rule (ref types.go:229-263): triggered when
    * `metric <op> threshold` has held for `durationMs`. `scaleBy` is
    * signed — positive in scale-up rule lists, negative in scale-down. */
  final case class Rule(id: String, metric: String, op: Op,
                        threshold: Double, scaleBy: Int, durationMs: Long = 0L)

  /** Scaling policy (ref types.go:180-228). */
  final case class Policy(id: String, minReplicas: Int, maxReplicas: Int,
                          cooldownMs: Long, scaleToZero: Boolean,
                          scaleUpRules: Seq[Rule], scaleDownRules: Seq[Rule]) {
    /** ref ClampReplicas, types.go:216-228 — scale-to-zero policies may
      * clamp to 0, others to minReplicas. */
    def clampReplicas(replicas: Int): Int = {
      val lo = if (scaleToZero) 0 else minReplicas
      math.max(lo, math.min(maxReplicas, replicas))
    }
  }

  /** Mutable evaluation state the reference keeps per policy
    * (ref types.go:300-332): current width, last scale time (cooldown),
    * and when each rule's condition FIRST became true (for-duration). */
  final case class State(currentReplicas: Int,
                         lastScaleTimeMs: Option[Long] = None,
                         pendingSinceMs: Map[String, Long] = Map.empty) {
    def isInCooldown(cooldownMs: Long, nowMs: Long): Boolean =
      lastScaleTimeMs.exists(t => nowMs - t < cooldownMs)
  }

  sealed trait Action
  object Action {
    case object None extends Action
    case object ScaleUp extends Action
    case object ScaleDown extends Action
  }

  /** The evaluator's output plus the state to carry to the next tick. */
  final case class Decision(action: Action, desiredReplicas: Int,
                            shouldExecute: Boolean, reason: String,
                            triggeredBy: Option[String], next: State)

  /** Evaluate one policy against current metric values — the reference's
    * EvaluatePolicy loop (evaluator.go:84-178) verbatim: cooldown first;
    * scale-up rules in order, FIRST rule that is triggered AND past its
    * for-duration wins; then scale-down the same way (guarded so only
    * scale-to-zero policies may go to 0); pending conditions start
    * their clock on first trigger and clear on first non-trigger.
    *
    * Two reference-faithful subtleties, kept deliberately (evaluator.go
    * behaves identically via its early returns):
    *  - pending clocks are only maintained for rules the tick actually
    *    REACHES — a win, or the cooldown veto, leaves later rules'
    *    pending entries untouched, so a rule whose condition lapsed
    *    while it was shadowed can fire from its old clock once reached
    *    again;
    *  - a triggered scale-up rule that cannot move (already clamped at
    *    maxReplicas) does not short-circuit the scale-down list — at the
    *    ceiling with both pressures active, the policy can step down and
    *    back up across ticks. Operators bound that with the cooldown. */
  def evaluatePolicy(policy: Policy, state: State,
                     metrics: Map[String, Double], nowMs: Long): Decision = {
    if (state.isInCooldown(policy.cooldownMs, nowMs)) {
      val remaining = policy.cooldownMs - (nowMs - state.lastScaleTimeMs.get)
      return Decision(Action.None, state.currentReplicas, shouldExecute = false,
        s"in cooldown (${remaining}ms remaining)", None, state)
    }
    var pending = state.pendingSinceMs

    def tryRules(rules: Seq[Rule], up: Boolean): Option[Decision] = {
      var out: Option[Decision] = None
      for (rule <- rules if out.isEmpty) {
        val value = metrics.getOrElse(rule.metric, Double.NaN)
        if (!value.isNaN && rule.op.evaluate(value, rule.threshold)) {
          val since = pending.getOrElse(rule.id, nowMs)
          pending += rule.id -> since
          if (nowMs - since >= rule.durationMs) {
            val target = policy.clampReplicas(state.currentReplicas + rule.scaleBy)
            val moves =
              if (up) target > state.currentReplicas
              else target < state.currentReplicas &&
                (target > 0 || policy.scaleToZero)
            if (moves) out = Some(Decision(
              if (up) Action.ScaleUp else Action.ScaleDown,
              target, shouldExecute = true,
              s"rule triggered: ${rule.metric} ${rule.op.name} " +
                s"${rule.threshold} (actual: $value)",
              Some(s"rule:${rule.id}"),
              State(target, Some(nowMs), pending)))
          }
        } else pending -= rule.id
      }
      out
    }

    tryRules(policy.scaleUpRules, up = true)
      .orElse(tryRules(policy.scaleDownRules, up = false))
      .getOrElse(Decision(Action.None, state.currentReplicas,
        shouldExecute = false, "no scaling rules triggered", None,
        state.copy(pendingSinceMs = pending)))
  }

  // ---- idle detection / scale-to-zero (C5; ref idle/detector.go:29-46,
  // 205-218, wake path 248-283). Defaults match the reference's Config.

  val DefaultIdleThresholdMs: Long = 30L * 60 * 1000
  val DefaultKeepAliveWindowMs: Long = 5L * 60 * 1000

  /** ref IsIdle: idle once no activity for `idleThresholdMs`. */
  def isIdle(lastActivityMs: Long, nowMs: Long,
             idleThresholdMs: Long = DefaultIdleThresholdMs): Boolean =
    nowMs - lastActivityMs >= idleThresholdMs

  /** Scale-to-zero gate: idle past the threshold AND outside the
    * keep-alive window after the last wake (the anti-flap grace the
    * detector config documents), and not already at zero. */
  def shouldScaleToZero(lastActivityMs: Long, lastWakeMs: Option[Long],
                        isScaledToZero: Boolean, nowMs: Long,
                        idleThresholdMs: Long = DefaultIdleThresholdMs,
                        keepAliveWindowMs: Long = DefaultKeepAliveWindowMs): Boolean =
    !isScaledToZero &&
      isIdle(lastActivityMs, nowMs, idleThresholdMs) &&
      lastWakeMs.forall(w => nowMs - w >= keepAliveWindowMs)

  /** Wake on activity while scaled to zero (ref wake/trigger.go: a query
    * arriving for a scaled-to-zero policy wakes it; activity otherwise
    * just resets the idle clock). */
  def shouldWake(isScaledToZero: Boolean, activityArrived: Boolean): Boolean =
    isScaledToZero && activityArrived
}
