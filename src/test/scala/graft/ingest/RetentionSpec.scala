package graft.ingest

import graft.SparkTestBase
import graft.queries.CdcQueries
import graft.observe.Metrics
import java.nio.file.Files

class RetentionSpec extends SparkTestBase {

  test("retention drops only day partitions older than the cutoff (S7)") {
    val dir = Files.createTempDirectory("graft-retention").toString
    CdcWriter.write(CdcQueries.envelope(spark, sf0001), dir)
    val before = Retention.listDays(spark, dir)
    assert(before.size > 25 && before.head == "2024-01-01")

    val dropped = Retention.dropOlderThan(spark, dir, "2024-01-08")
    assert(dropped === before.filter(_ < "2024-01-08"))
    val after = Retention.listDays(spark, dir)
    assert(after === before.filter(_ >= "2024-01-08"))
    // data for retained days still reads cleanly
    val remaining = CdcWriter.read(spark, dir)
    assert(remaining.count() > 0)
    // idempotent: second run drops nothing
    assert(Retention.dropOlderThan(spark, dir, "2024-01-08") === Seq.empty)
  }

  test("streaming ingest feeds the philotes metric surface") {
    import spark.implicits._
    Metrics.reset()
    val listener = Metrics.attach(spark)
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp, String, String)]
      stream.addData((1L, "INSERT", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "0001", "users"))
      val df = stream.toDF().toDF("event_id", "_cdc_operation", "_cdc_timestamp", "_cdc_lsn", "_cdc_table")
      val cfg = graft.streaming.IngestConfig(
        outDir = Files.createTempDirectory("graft-m-out").toString,
        dlqDir = Files.createTempDirectory("graft-m-dlq").toString,
        checkpointDir = Files.createTempDirectory("graft-m-ckpt").toString)
      graft.streaming.IngestPipeline.start(df, cfg, availableNow = true).awaitTermination()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      var snap = Metrics.snapshot()
      while (!snap.contains("philotes_cdc_events_total") && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); snap = Metrics.snapshot()
      }
      assert(snap.getOrElse("philotes_cdc_events_total", 0.0) >= 1.0)
      assert(snap.getOrElse("philotes_buffer_batches_total", 0.0) >= 1.0)
    } finally {
      spark.streams.removeListener(listener)
      Metrics.reset()
    }
  }
}
