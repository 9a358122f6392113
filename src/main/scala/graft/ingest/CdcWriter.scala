package graft.ingest

import graft.model.SchemaBuilder
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch CDC write path: envelope → day-partitioned columnar table.
  *
  * The reference buffers events in Postgres, encodes Parquet in memory and
  * commits files to Iceberg with a day(_cdc_timestamp) partition spec
  * (ref internal/iceberg/writer/writer.go:95-194, schema/schema.go:106-135).
  * Spark-native: one `write.partitionBy(_cdc_date)` — the lake layout
  * (hive-style day directories) is what makes partition pruning work at
  * 100 TB; no Iceberg jar ships in this container, so plain parquet dirs
  * stand in for Iceberg tables (SURVEY §7.3; commit atomicity would come
  * free with the iceberg-spark runtime).
  *
  * Fidelity fix vs reference: columns are written TYPED. The reference's
  * physical files hold the whole row as one JSON string column
  * (ref writer/parquet.go:48-66) and its declared schema lies; here the
  * declared and physical schemas are the same thing.
  */
object CdcWriter {

  /** Derived day-partition column (ref schema.go:106-135: `_cdc_date`). */
  def withPartitionColumn(envelope: DataFrame): DataFrame =
    envelope.withColumn(SchemaBuilder.partitionColumn,
      date_format(col(Cdc.TsColumn), "yyyy-MM-dd"))

  /** Write one table's envelope day-partitioned.
    *
    * The pre-write `repartition(partitionCol)` routes each day to one
    * task: without it every write task emits a file into every day dir
    * (tasks × days small files — the same small-file problem the
    * reference suffers from its 5 s batches, writer/writer.go:141-163). */
  def write(envelope: DataFrame, tableDir: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    withPartitionColumn(envelope)
      .repartition(col(SchemaBuilder.partitionColumn))
      .write.mode(mode)
      .partitionBy(SchemaBuilder.partitionColumn)
      .parquet(tableDir)

  /** Per-table fanout (ref groupEventsByTable, writer/writer.go:114-123):
    * the distinct table list of a micro-batch is tiny (it is the number of
    * captured tables, not rows), so collecting it on the driver matches
    * the reference and stays O(tables). Each table is then written by a
    * filtered, fully-distributed job. */
  def routeAndWrite(envelope: DataFrame, baseDir: String, tableCol: String,
                    mode: SaveMode = SaveMode.Append): Seq[String] = {
    val tables = envelope.select(col(tableCol)).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    tables.foreach { t =>
      write(envelope.filter(col(tableCol) === t), s"$baseDir/$t", mode)
    }
    tables
  }

  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)

  /** Lake-level MERGE: apply a CDC delta batch as upserts into the STORED
    * day-partitioned current-state table — the reference writer's upsert
    * semantics (ref internal/iceberg/writer/writer.go:95-194) applied to
    * the physical lake, not just a DataFrame view.
    *
    * Contract: `deltas` is the stream suffix after the stored snapshot's
    * watermark (the reference applies its ordered batch last-write-wins,
    * with no version comparison — same here; [[Cdc.latestVersions]]
    * collapses the batch to one newest version per key first).
    *
    * The 100 TB shape:
    *  1. Locate affected partitions with a KEY+PARTITION-column-only scan
    *     (parquet reads two thin columns; Iceberg metadata/blooms would
    *     shortcut this further) semi-joined against the broadcast delta
    *     key set — the delta batch is the small side by construction.
    *  2. Read ONLY those partitions in full, anti-join out the affected
    *     keys (survivors keep their rows), union the delta upserts.
    *  3. Rewrite the touched partitions to a temp tree in one job, then
    *     swap per partition — untouched partitions are never read in
    *     full, never rewritten, and keep their files byte-for-byte
    *     (asserted in LakeMergeSpec). A mid-rewrite failure leaves every
    *     original partition intact (the [[Compaction.compact]] pattern;
    *     Iceberg's snapshot commit would make the swap atomic for real).
    *
    * Returns the swapped partition values (sorted). DELETE deltas drop
    * the key; a partition emptied of all rows is removed. */
  def merge(spark: SparkSession, tableDir: String, deltas: DataFrame,
            keyCols: Seq[String]): Seq[String] = {
    val pcol = SchemaBuilder.partitionColumn
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the collapsed batch feeds four consumers (key probe, new-day scan,
    // upsert union, anti-join key set) — persist so the delta source and
    // its latest-per-key window run once, not four times
    val deltaLatest = Cdc.latestVersions(deltas, keyCols).persist()
    try merge0(spark, tableDir, deltaLatest, keyCols, pcol, root, fs)
    finally deltaLatest.unpersist()
  }

  private def merge0(spark: SparkSession, tableDir: String,
                     deltaLatest: DataFrame, keyCols: Seq[String],
                     pcol: String, root: org.apache.hadoop.fs.Path,
                     fs: org.apache.hadoop.fs.FileSystem): Seq[String] = {
    val upserts = withPartitionColumn(
      deltaLatest.filter(col(Cdc.OpColumn) =!= "DELETE"))
    val deltaKeys = deltaLatest.select(keyCols.map(col): _*).distinct()
    // partition-discovery read: hive layout yields pcol as a column;
    // normalize to string so day values compare stably. A table that does
    // not exist yet reads as empty (bootstrap: the first merged batch
    // CREATES the table — the streaming-upsert sink's first trigger).
    val stored =
      if (fs.exists(root))
        spark.read.parquet(tableDir).withColumn(pcol, col(pcol).cast("string"))
      else upserts.filter(lit(false))
    val affectedDays = stored
      .select(keyCols.map(col) :+ col(pcol): _*)
      .join(broadcast(deltaKeys), keyCols, "left_semi")
      .select(col(pcol)).distinct().collect().map(_.getString(0))
    val newDays = upserts.select(col(pcol)).distinct()
      .collect().map(_.getString(0))
    val touched = (affectedDays ++ newDays).distinct.sorted.toSeq
    if (touched.isEmpty) return Seq.empty
    val survivors = stored.filter(col(pcol).isin(touched: _*))
      .join(broadcast(deltaKeys), keyCols, "left_anti")
    val merged = survivors.unionByName(upserts)
    val tmpDir = new org.apache.hadoop.fs.Path(root, ".merge_tmp")
    merged.repartition(col(pcol))
      .write.mode(SaveMode.Overwrite).partitionBy(pcol).parquet(tmpDir.toString)
    touched.foreach { day =>
      val partDir = new org.apache.hadoop.fs.Path(root, s"$pcol=$day")
      val newDir = new org.apache.hadoop.fs.Path(tmpDir, s"$pcol=$day")
      fs.delete(partDir, true)
      if (fs.exists(newDir)) { // absent = the merge emptied this partition
        fs.mkdirs(partDir)
        fs.listStatus(newDir)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach(f => fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(partDir, f.getPath.getName)))
      }
    }
    fs.delete(tmpDir, true)
    touched
  }
}

/** Time-travel emulation over the CDC envelope.
  *
  * The reference exposes Iceberg `FOR TIMESTAMP AS OF` / `FOR VERSION AS
  * OF` and metadata tables through Trino (ref docs/query/
  * sample-queries.sql:47-61). Without the Iceberg runtime, the envelope
  * itself is the full history, so AS OF t = "latest version per key among
  * events with commit position ≤ t" — the same reconstruction Iceberg
  * does from snapshots, expressed as filter + window (both engines can
  * replay it, so it stays oracle-checkable).
  */
object TimeTravel {

  /** State as of a timestamp (inclusive): filter, latest per key, drop
    * keys whose newest op ≤ t is DELETE. */
  def asOfTimestamp(envelope: DataFrame, keyCols: Seq[String], ts: Column): DataFrame =
    Cdc.currentState(envelope.filter(col(Cdc.TsColumn) <= ts), keyCols)

  /** State as of an LSN (inclusive) — LSNs are zero-padded sortable
    * strings, the total order Postgres provides. */
  def asOfLsn(envelope: DataFrame, keyCols: Seq[String], lsn: Column): DataFrame =
    Cdc.currentState(envelope.filter(col(Cdc.LsnColumn) <= lsn), keyCols)

  /** Snapshot listing: one row per commit day with event count and LSN
    * watermark (emulates the `$snapshots` metadata table,
    * ref sample-queries.sql:55-61). */
  def snapshots(envelope: DataFrame): DataFrame =
    envelope
      .groupBy(date_trunc("day", col(Cdc.TsColumn)).as("snapshot_day"))
      .agg(count(lit(1)).as("n_events"),
        max(col(Cdc.LsnColumn)).as("lsn_watermark"))
      .orderBy(col("snapshot_day"))
}
