package graft.api

import java.util.concurrent.atomic.AtomicBoolean

import scala.util.control.NonFatal

/** THE interval-tick daemon scaffolding shared by the evaluation loops
  * ([[AlertManager]], [[ScalingManager]]): a named daemon thread that
  * SLEEPS FIRST and then ticks every `intervalMs` until closed.
  *
  * Sleeping before the first tick matches the reference's
  * `time.NewTicker` (which fires only after the first interval) and is
  * load-bearing for the scaling loop: an immediate tick on service
  * start would evaluate against a not-yet-populated metrics registry,
  * reading NaN for every rule and WIPING the persisted for-duration
  * pending clocks a restart is supposed to preserve.
  *
  * A tick's failure is logged and never kills the loop. */
private[api] final class TickerDaemon(name: String, intervalMs: Long,
                                      tick: () => Unit)
  extends AutoCloseable {

  private val stopped = new AtomicBoolean(false)
  private var thread: Thread = _

  /** Start (idempotent, and restartable after [[close]] — the stop
    * flag resets here, or a start-after-close would spawn a thread
    * that exits immediately: a silently dead loop). */
  def start(): Unit = synchronized {
    if (thread != null) return
    stopped.set(false)
    thread = new Thread(() => {
      while (!stopped.get()) {
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
        if (!stopped.get()) {
          try tick()
          catch { case NonFatal(e) =>
            System.err.println(s"[$name] cycle failed: ${e.getMessage}")
          }
        }
      }
    })
    thread.setDaemon(true)
    thread.setName(name)
    thread.start()
  }

  override def close(): Unit = synchronized {
    stopped.set(true)
    if (thread != null) { thread.interrupt(); thread.join(5000L); thread = null }
  }
}
