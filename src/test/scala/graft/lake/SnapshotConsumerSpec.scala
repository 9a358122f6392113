package graft.lake

import graft.SparkTestBase
import graft.ingest.{Cdc, CdcWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[SnapshotConsumer]]: the checkpointed lake-tail loop. The registered
  * `cdc_log_consume` query hash-checks the crash/replay/drain flow; this
  * spec pins the offset-protocol details the hash can't see. */
class SnapshotConsumerSpec extends SparkTestBase {

  private def env(rows: (Long, Long, Double, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "value", Cdc.OpColumn, "day")
      .withColumn(Cdc.TsColumn,
        to_timestamp(concat(col("day"), lit(" 12:00:00"))))
      .withColumn(Cdc.LsnColumn, lpad(col("event_id").cast("string"), 16, "0"))
      .drop("day")
  }

  test("offset protocol: max wins, old markers cleaned, temp debris ignored") {
    val ckpt = Files.createTempDirectory("graft-consumer-ckpt").toString
    assert(SnapshotConsumer.lastProcessed(spark, ckpt) === 0L)
    SnapshotConsumer.commitOffset(spark, ckpt, 3L)
    SnapshotConsumer.commitOffset(spark, ckpt, 7L)
    assert(SnapshotConsumer.lastProcessed(spark, ckpt) === 7L)
    // old markers swept; a crashed (un-renamed) temp marker is invisible
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(ckpt))
      .map(_.getPath.getName).toSeq
    assert(names === Seq("offset-7"))
    fs.create(new org.apache.hadoop.fs.Path(ckpt, ".tmp-offset-crashed"), false).close()
    assert(SnapshotConsumer.lastProcessed(spark, ckpt) === 7L)
  }

  test("a poll on an empty or drained table is None and commits nothing") {
    val base = Files.createTempDirectory("graft-consumer-none").toString
    val (src, ckpt) = (s"$base/t", s"$base/ckpt")
    assert(SnapshotConsumer.pollOnce(spark, src, ckpt)((_, _, _) => ()).isEmpty)
    CdcWriter.appendCommit(spark, src, env((1L, 1L, 1.0, "INSERT", "2024-01-01")))
    assert(SnapshotConsumer.pollOnce(spark, src, ckpt)((_, _, _) => ())
      .contains((0L, 1L)))
    assert(SnapshotConsumer.pollOnce(spark, src, ckpt)((_, _, _) => ()).isEmpty)
    assert(SnapshotConsumer.lastProcessed(spark, ckpt) === 1L)
  }

  test("a crash before process leaves the offset untouched; multi-commit windows coalesce") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-consumer-crash").toString
    val (src, ckpt) = (s"$base/t", s"$base/ckpt")
    CdcWriter.appendCommit(spark, src, env((1L, 1L, 1.0, "INSERT", "2024-01-01")))
    CdcWriter.appendCommit(spark, src, env((2L, 2L, 2.0, "INSERT", "2024-01-01")))
    intercept[RuntimeException] {
      SnapshotConsumer.pollOnce(spark, src, ckpt)((_, _, _) =>
        throw new RuntimeException("boom"))
    }
    assert(SnapshotConsumer.lastProcessed(spark, ckpt) === 0L)
    // the retry coalesces BOTH pending commits into one window
    var seen = Seq.empty[Long]
    assert(SnapshotConsumer.pollOnce(spark, src, ckpt) { (b, _, _) =>
      seen = b.select($"user_id").as[Long].collect().toSeq.sorted
    }.contains((0L, 2L)))
    assert(seen === Seq(1L, 2L))
  }
}
