package graft.reliability

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dead-letter queue: failed micro-batches land in an append-only table
  * with the original payload JSON plus error columns.
  *
  * Mirrors the reference's FailedEvent model and error typing
  * (ref internal/cdc/deadletter/deadletter.go:13-68: transient/permanent/
  * validation/schema/unknown + retry_count + created_at/expires_at), minus
  * the Postgres storage — the DLQ is itself a lake table, so its contents
  * are queryable with the same engine (`groupBy(error_type).count()` is
  * the reference's GetStats, deadletter/postgres.go:300-352).
  */
object DeadLetter {

  object ErrorType {
    val Transient = "transient"
    val Permanent = "permanent"
    val Validation = "validation"
    val Schema = "schema"
    val Unknown = "unknown"
  }

  /** Classify a failure (ref deadletter.go error typing; the reference
    * classifies by error source — here by exception family). */
  def classify(e: Throwable): String = e match {
    case _: NonRetryableException                  => ErrorType.Permanent
    case _: IllegalArgumentException               => ErrorType.Validation
    case _: org.apache.spark.sql.AnalysisException => ErrorType.Schema
    case _: java.io.IOException                    => ErrorType.Transient
    case Retry.Exhausted(_, last)                  => classify(last)
    case _                                         => ErrorType.Unknown
  }

  /** Append a failed batch to the DLQ dir. Every original column is
    * preserved as one JSON payload column (ref Event⇄FailedEvent JSON
    * round-trip, deadletter.go:100-130) so the DLQ schema is stable no
    * matter which table the batch belonged to. */
  def append(batch: DataFrame, dlqDir: String, sourceId: String,
             tableName: String, error: Throwable, retryCount: Int): Unit = {
    val failed = batch
      .select(to_json(struct(col("*"))).as("event_data"))
      .withColumn("source_id", lit(sourceId))
      // cast: a null name must land as a typed string null, not NullType
      // (parquet can't encode a void column)
      .withColumn("table_name", lit(tableName).cast("string"))
      .withColumn("error_message", lit(String.valueOf(error.getMessage)))
      .withColumn("error_type", lit(classify(error)))
      .withColumn("retry_count", lit(retryCount))
      .withColumn("created_at", current_timestamp())
      .withColumn("retried_at", lit(null).cast("timestamp"))
    failed.write.mode(SaveMode.Append).parquet(dlqDir)
  }

  /** The stable DLQ schema ([[append]] writes exactly these columns;
    * `retried_at` null = pending, set by [[replay]]'s MarkRetried). */
  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_data", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("table_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("error_message", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("error_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("retry_count", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("created_at", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("retried_at", org.apache.spark.sql.types.TimestampType)))

  /** An append-mode DLQ dir only exists once something failed; an absent
    * dir reads as the empty DLQ (so stats/read agree with an oracle that
    * derives zero failures), not as a scan error. DLQ dirs written before
    * the `retried_at` column existed read it back as null — pending. */
  /** Heal a crashed [[replay]] mark-swap: if the live dir is gone, the
    * `.marking` copy (complete, newest) or the `.replaced` aside (the
    * pre-mark original) is restored — a crash can delay the MarkRetried
    * bookkeeping (rows replay once more: at-least-once, the reference's
    * own guarantee) but never lose the DLQ. */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(p)) {
      val marking = p.suffix(".marking")
      val replaced = p.suffix(".replaced")
      if (fs.exists(marking)) { fs.rename(marking, p): Unit }
      else if (fs.exists(replaced)) { fs.rename(replaced, p): Unit }
    }

  def read(spark: SparkSession, dlqDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dlqDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, p)
    if (fs.exists(p)) {
      val df = spark.read.parquet(dlqDir)
      if (df.columns.contains("retried_at")) df
      else df.withColumn("retried_at", lit(null).cast("timestamp"))
    }
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Replay pending dead-letters: Read → repair → reprocess → MarkRetried
    * (ref internal/cdc/deadletter/postgres.go:199-238 — the operator
    * loop that fixes the poison and routes it back through the pipeline).
    *
    * `event_data` decodes back to the ORIGINAL batch columns via
    * `batchSchema`, `repair` fixes what made it fail (a table name, a
    * type), and `process` is the real ingest entry (typically
    * `IngestPipeline.processBatch(cfg)(_, batchId)`). Rows that fail
    * AGAIN simply dead-letter again through `process`'s own DLQ path —
    * replay is safe to re-run. Marking rewrites the DLQ table whole: the
    * DLQ is failure-sized, not data-sized, so a rewrite is the lake
    * equivalent of the reference's per-row UPDATE. Returns # replayed. */
  def replay(spark: SparkSession, dlqDir: String,
             batchSchema: org.apache.spark.sql.types.StructType,
             repair: DataFrame => DataFrame,
             process: DataFrame => Unit): Long = {
    val dlq = read(spark, dlqDir)
    val pending = dlq.filter(col("retried_at").isNull)
    val n = pending.count()
    if (n == 0) return 0L
    // cutoff: rows `process` dead-letters AGAIN append with a later
    // created_at — they must stay pending, not get marked by this pass
    val cutoff = pending.agg(max(col("created_at"))).collect()(0).getTimestamp(0)
    process(repair(
      pending.select(from_json(col("event_data"), batchSchema).as("_e"))
        .select(col("_e.*"))))
    // MarkRetried: re-read AFTER process (its re-failures appended files
    // our first listing never saw), then rewrite-and-swap.
    val p = new org.apache.hadoop.fs.Path(dlqDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rewriteSwap(fs, p, "replay") {
      read(spark, dlqDir).withColumn("retried_at",
        when(col("retried_at").isNull && col("created_at") <= cutoff,
          current_timestamp()).otherwise(col("retried_at")))
    }
    n
  }

  /** Rewrite the DLQ table via rename-aside: materialize `survivors` to
    * `.marking` (the frame READS the live dir — overwriting in place
    * would clobber its own input), move the live dir to `.replaced`,
    * rename the rewrite in, delete the aside LAST. Every crash window
    * keeps a complete copy and [[recoverSwap]] heals the in-between
    * states. `survivors` is evaluated HERE so its file listing is as
    * fresh as possible; a row appended inside the remaining listing→swap
    * window would be lost — the DLQ is single-writer in this engine
    * (appends happen in the batch processor, rewrites are operator
    * tasks); a transactional table format would close it for real. */
  private def rewriteSwap(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path, opName: String)(
                          survivors: => DataFrame): Unit = {
    val tmp = p.suffix(".marking")
    val aside = p.suffix(".replaced")
    survivors.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(aside)) fs.delete(aside, true)
    if (!fs.rename(p, aside))
      throw new java.io.IOException(s"$opName: failed to move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(aside, p) // restore; the rewrite stays at .marking
      throw new java.io.IOException(s"$opName: failed to move $tmp into place")
    }
    fs.delete(aside, true)
  }

  /** Failure counts by (source, table, error type). The reference's
    * GetStats (deadletter/postgres.go:274-352) computes the by-source and
    * by-error-type MARGINALS; this triple grouping is a refinement from
    * which both marginals are derivable by summing out the other keys. */
  def stats(spark: SparkSession, dlqDir: String): DataFrame =
    read(spark, dlqDir)
      .groupBy(col("source_id"), col("table_name"), col("error_type"))
      .agg(count(lit(1)).as("n_failed"))
      .orderBy(col("source_id"), col("table_name"), col("error_type"))

  /** Filtered read surfaces (ref ReadBySource / ReadByTable,
    * deadletter/postgres.go:137-171) — predicate pushdown makes these
    * partition/row-group-pruned scans, not full-DLQ filters. */
  def readBySource(spark: SparkSession, dlqDir: String, sourceId: String): DataFrame =
    read(spark, dlqDir).filter(col("source_id") === sourceId)

  def readByTable(spark: SparkSession, dlqDir: String, tableName: String): DataFrame =
    read(spark, dlqDir).filter(col("table_name") === tableName)

  /** Drop dead-letters whose TTL has lapsed (ref expires_at at insert +
    * Cleanup, deadletter/deadletter.go:40-68, postgres.go:240-272 —
    * expires_at = created_at + TTL, delete where expired). `now` is a
    * parameter so retention is deterministic and testable; the rewrite
    * swaps via the same rename-aside pattern as [[replay]] (the DLQ is
    * failure-sized — a rewrite IS the lake-table equivalent of the
    * reference's DELETE). Returns the number of rows dropped. */
  def cleanup(spark: SparkSession, dlqDir: String, ttlSeconds: Long,
              now: java.sql.Timestamp): Long = {
    val p = new org.apache.hadoop.fs.Path(dlqDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, p)
    if (!fs.exists(p)) return 0L
    val dlq = read(spark, dlqDir)
    // expires_at = created_at + TTL; expired ⇔ created_at ≤ now - TTL
    val expired =
      col("created_at") <= lit(new java.sql.Timestamp(now.getTime - ttlSeconds * 1000L))
    val n = dlq.filter(expired).count()
    if (n == 0) return 0L
    // survivors come from a FRESH read inside the swap, not the counting
    // snapshot above — rows appended while we counted stay in the table
    rewriteSwap(fs, p, "cleanup")(read(spark, dlqDir).filter(!expired))
    n
  }
}
