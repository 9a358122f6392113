package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r22 micro-batch job-structure optimization: an UPDATE merge
  * (no TRUNCATE) runs exactly THREE driver actions —
  *   1. the truncate-marker probe aggregate,
  *   2. the ONE fused touched-day probe (affected ∪ new days; the
  *      latest-per-key cache fills inside it),
  *   3. the survivors+upserts write.
  * Before the fusion the day probe was three independent actions (the
  * per-batch job count is the streaming sinks' fixed overhead, guide
  * §1.2); a regression re-splitting it shows up here as extra actions,
  * not as a silent slowdown. */
class MergeActionCountSpec extends AnyFunSuite with SparkTestBase {

  private def envelope(ids: Seq[Long], lsnBase: Int) = {
    import spark.implicits._
    ids.zipWithIndex.map { case (id, i) =>
      (id, id * 10, 1.0, "INSERT",
        java.sql.Timestamp.valueOf(f"2024-01-${(id % 3) + 1}%02d 00:00:00"),
        f"${lsnBase + i}%016d")
    }.toDF("user_id", "event_id", "value",
      Cdc.OpColumn, Cdc.TsColumn, Cdc.LsnColumn)
  }

  test("update merge runs exactly 3 actions: marker probe, fused day probe, write") {
    val dir = java.nio.file.Files.createTempDirectory("mergeactions").toString
    // bootstrap commit (not measured: the first merge has extra
    // import/bootstrap structure)
    CdcWriter.merge(spark, s"$dir/t", envelope(1L to 9L, 100), Seq("user_id"))

    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        actions.incrementAndGet(): Unit
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    // listener events post asynchronously on a shared bus: give any
    // PRIOR suite's (or the bootstrap merge's) in-flight events time to
    // land before the counted window opens, so they are never attributed
    // to the measured merge
    Thread.sleep(500)
    spark.listenerManager.register(listener)
    try {
      // an update batch touching a subset of keys, no TRUNCATE marker
      CdcWriter.merge(spark, s"$dir/t", envelope(Seq(2L, 5L), 200), Seq("user_id"))
      // listener events post asynchronously; poll-bounded drain
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (actions.get < 3 && System.nanoTime() < deadline) Thread.sleep(25)
      Thread.sleep(300) // catch any EXTRA action still in flight
      assert(actions.get == 3,
        s"expected 3 actions (marker probe, fused day probe, write), got ${actions.get}")
    } finally spark.listenerManager.unregister(listener)

    // and the merge result stays exact
    val got = CdcWriter.read(spark, s"$dir/t")
      .select("user_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(got.toSeq == (1L to 9L))
  }
}
