package graft.streaming

import graft.SparkTestBase
import graft.reliability.RetryPolicy
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Multi-batch crash-resume: a crash injected at the top of micro-batch 2
  * fails the query with batches 0-1 committed; a restart from the same
  * checkpoint re-runs batch 2 whole and drains the rest. The registered
  * `cdc_stream_resume` query hash-checks the FINAL state against the
  * DuckDB oracle; this spec asserts the MID-crash state the hash can't
  * see — that run 1 really committed a strict subset, and that the resume
  * added exactly the complement (no replayed duplicates, no skipped
  * files). Ref claim: internal/cdc/pipeline/pipeline.go:279-306.
  */
class CrashResumeSpec extends SparkTestBase {

  test("crash at batch 2 commits batches 0-1; restart drains exactly-once") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-crash-resume").toString
    val n = 40
    val src = (1 to n).map { i =>
      (i.toLong, i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        f"$i%016d", "t0")
    }.toDF("user_id", "event_id", "_cdc_timestamp", "_cdc_lsn", "_cdc_table")
    src.repartition(4).write.parquet(s"$base/src")
    val schema = spark.read.parquet(s"$base/src").schema
    val cfg = IngestConfig(
      outDir = s"$base/lake", dlqDir = s"$base/dlq",
      checkpointDir = s"$base/ckpt", sourceId = "crash_resume",
      retry = RetryPolicy(maxAttempts = 2, sleep = _ => ()))
    def stream = IngestPipeline.fileEnvelopeSource(
      spark, s"$base/src", schema, maxFilesPerTrigger = 1)

    val q1 = IngestPipeline.start(stream, cfg, availableNow = true,
      beforeBatch = id => if (id >= 2)
        throw new IllegalStateException("injected crash"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(e.getMessage.contains("injected crash"))

    // mid state: batches 0 and 1 (one file each) committed, nothing else
    val mid = spark.read.parquet(s"$base/lake/t0")
      .select("event_id").as[Long].collect()
    assert(mid.length > 0 && mid.length < n,
      s"run 1 should commit a strict subset, got ${mid.length} of $n")
    assert(mid.distinct.length === mid.length)

    // resume: same checkpoint, no crash — drains the complement exactly
    IngestPipeline.start(stream, cfg, availableNow = true).awaitTermination()
    val fin = spark.read.parquet(s"$base/lake/t0")
      .select("event_id").as[Long].collect().sorted
    assert(fin.toSeq === (1 to n).map(_.toLong))
  }
}
