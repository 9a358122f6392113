package graft.observe

import scala.util.control.NonFatal

/** Component health aggregation (ref internal/cdc/health/health.go:14-120:
  * named checkers → per-component status → overall). The HTTP /health
  * endpoints are deployment furniture; the aggregation rule is the logic:
  * any unhealthy → unhealthy, else any degraded → degraded, else healthy.
  */
object Health {

  sealed abstract class Status(val name: String)
  case object Healthy extends Status("healthy")
  case object Degraded extends Status("degraded")
  case object Unhealthy extends Status("unhealthy")
  case object Unknown extends Status("unknown")

  final case class CheckResult(
      component: String,
      status: Status,
      message: String = "",
      durationMs: Long = 0L)

  /** Run all checkers; a throwing checker is itself unhealthy
    * (ref health.go: check errors produce unhealthy results). */
  def runChecks(checkers: Map[String, () => CheckResult]): Seq[CheckResult] =
    checkers.toSeq.sortBy(_._1).map { case (name, check) =>
      val t0 = System.nanoTime()
      try check().copy(durationMs = (System.nanoTime() - t0) / 1000000)
      catch {
        case NonFatal(e) =>
          CheckResult(name, Unhealthy, message = String.valueOf(e.getMessage),
            durationMs = (System.nanoTime() - t0) / 1000000)
      }
    }

  /** Overall status (ref health.go aggregation order). */
  def overall(results: Seq[CheckResult]): Status =
    if (results.isEmpty) Unknown
    else if (results.exists(_.status == Unhealthy)) Unhealthy
    else if (results.exists(_.status == Degraded)) Degraded
    else Healthy
}
