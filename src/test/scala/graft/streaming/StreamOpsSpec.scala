package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamOpsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling windows finalize in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val windows = StreamOps.tumblingCounts(
      stream.toDF().toDF("event_id", "ts"), "ts",
      watermarkDelay = "10 minutes", windowDuration = "1 hour")

    val q = windows.writeStream
      .format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // two events in the 00:00 window, one in the 01:00 window
      stream.addData((1L, ts("2024-01-01 00:10:00")), (2L, ts("2024-01-01 00:40:00")),
        (3L, ts("2024-01-01 01:05:00")))
      q.processAllAvailable()
      // nothing emitted yet: watermark (01:05 - 10 min) hasn't passed 01:00
      assert(spark.table("tumbling_test").count() === 0)
      // events far ahead advance the watermark and close earlier windows
      // (the 05:00 event closes 03:00's window too — watermark 04:50)
      stream.addData((4L, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      stream.addData((5L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .orderBy("window_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(rows.toSeq === Seq(
        ("2024-01-01 00:00:00.0", 2L),
        ("2024-01-01 01:00:00.0", 1L),
        ("2024-01-01 03:00:00.0", 1L)))
    } finally q.stop()
  }

  test("session windows merge on the gap and finalize in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val sessions = StreamOps.sessionCounts(
      stream.toDF().toDF("user_id", "ts"), "ts", "user_id",
      watermarkDelay = "10 minutes", gap = "30 minutes")

    val q = sessions.writeStream
      .format("memory").queryName("session_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: two events 20 min apart (one session), then one 2h later
      // (a second session); user 2: one event
      stream.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:20:00")),
        (2L, ts("2024-01-01 00:05:00")), (1L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // advance the watermark far enough to close every session
      stream.addData((3L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      stream.addData((3L, ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      // sessions end gap after the last contained event
      assert(rows.toSeq.take(3) === Seq(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:50:00.0", 2L),
        (1L, "2024-01-01 02:00:00.0", "2024-01-01 02:30:00.0", 1L),
        (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:35:00.0", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp)]
    val deduped = StreamOps.dedupWithinWatermark(
      stream.toDF().toDF("fp", "ts"), "ts", "fp", "10 minutes")

    val q = deduped.writeStream
      .format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // duplicate fingerprint within the horizon: second copy dropped
      stream.addData(("a", ts("2024-01-01 00:00:00")), ("a", ts("2024-01-01 00:01:00")),
        ("b", ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_test").select("fp").as[String]
        .collect().sorted.toSeq === Seq("a", "b"))
      // same key long after the watermark passed: state was evicted, so
      // the "duplicate" is admitted again — bounded-state semantics
      stream.addData(("a", ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      stream.addData(("a", ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      val n = spark.table("dedup_test").filter($"fp" === "a").count()
      assert(n >= 2, s"expected re-admission after state eviction, got $n")
    } finally q.stop()
  }

  test("stream-stream interval join bounds state by the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, Timestamp)]
    val right = MemoryStream[(Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      left.toDF().toDF("l_user", "lts"),
      right.toDF().toDF("r_user", "rts"))

    val q = joined.writeStream
      .format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // click at 00:30 is within the hour before the 01:00 purchase;
      // the 23:00-previous-day click is not
      right.addData((1L, ts("2024-01-01 00:30:00")), (1L, ts("2023-12-31 23:00:00")))
      left.addData((1L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test")
        .select("l_user", "rts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString))
      assert(rows.toSeq === Seq((1L, "2024-01-01 00:30:00.0")))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val activity = StreamOps.runningActivity(stream.toDS())

    val q = activity.toDF().writeStream
      .format("memory").queryName("activity_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      stream.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:05:00")),
        (2L, ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // second batch: state must carry over, counts accumulate
      stream.addData((1L, ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      val latest = spark.table("activity_test")
        .groupBy("userId")
        .agg(org.apache.spark.sql.functions.max("nEvents").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(latest === Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }
}
