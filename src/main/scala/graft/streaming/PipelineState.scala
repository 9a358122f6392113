package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import scala.annotation.tailrec

/** Pipeline lifecycle state machine with a legal-transition table.
  *
  * Mirrors the reference exactly (ref internal/cdc/pipeline/state.go:12-157:
  * starting/running/paused/stopping/stopped/failed + validTransitions).
  * Spark's StreamingQuery has its own lifecycle, but the PAUSED state —
  * the reference's backpressure response — has no Spark equivalent, so
  * pipelines that pause/resume (e.g. on DLQ pressure) track it here;
  * listeners receive every transition (ref state.go listener callbacks).
  */
object PipelineState extends Enumeration {
  val Starting, Running, Paused, Stopping, Stopped, Failed = Value

  /** ref state.go validTransitions */
  val validTransitions: Map[Value, Set[Value]] = Map(
    Starting -> Set(Running, Failed, Stopping),
    Running -> Set(Paused, Stopping, Failed),
    Paused -> Set(Running, Stopping, Failed),
    Stopping -> Set(Stopped, Failed),
    Stopped -> Set(Starting),
    Failed -> Set(Starting, Stopped),
  )

  def name(s: Value): String = s.toString.toLowerCase
}

final class StateMachine(initial: PipelineState.Value = PipelineState.Starting) {
  import PipelineState._

  private val ref = new AtomicReference[Value](initial)
  private val listeners =
    new java.util.concurrent.CopyOnWriteArrayList[(Value, Value) => Unit]()

  def state: Value = ref.get()

  def onTransition(f: (Value, Value) => Unit): Unit = listeners.add(f)

  /** Attempt a transition; false (no state change) when illegal. */
  @tailrec
  def transition(to: Value): Boolean = {
    val from = ref.get()
    if (!validTransitions(from).contains(to)) false
    else if (!ref.compareAndSet(from, to)) transition(to)
    else {
      listeners.forEach(f => f(from, to))
      true
    }
  }

  /** Events may be processed only while running (ref state.go CanProcess —
    * the pause-wait check in the pipeline loop, pipeline.go:201-211). */
  def canProcess: Boolean = state == Running
}
