package graft.ingest

import graft.model.SchemaBuilder
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for day-partitioned CDC tables.
  *
  * The reference writes one parquet file per 5 s micro-batch per table
  * (ref internal/iceberg/writer/writer.go:141-163) and has no rewrite
  * job — its tables accrete thousands of tiny files, the classic lake
  * pathology. With the Iceberg runtime this is `rewrite_data_files`;
  * over plain parquet dirs the equivalent is a per-partition rewrite:
  * read a day directory, coalesce to the target file count, atomically
  * swap via rename. Partitions are compacted independently, so the job
  * parallelizes across days and a failure affects at most one
  * partition's swap.
  */
object Compaction {

  /** Number of data files in each day partition. */
  def fileCounts(spark: SparkSession, tableDir: String): Map[String, Int] = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Map.empty
    val prefix = SchemaBuilder.partitionColumn + "="
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map { dir =>
        val n = fs.listStatus(dir.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        dir.getPath.getName.stripPrefix(prefix) -> n
      }.toMap
  }

  /** Rewrite every day partition holding more than `maxFiles` files down
    * to exactly `targetFiles`. Returns the compacted partition values.
    *
    * ONE distributed job rewrites all oversized partitions: the scan
    * prunes to just those days (partition-column filter), rows are
    * clustered by day (+ a deterministic salt when targetFiles > 1) so
    * each day lands in exactly targetFiles output files, and the whole
    * temp tree is written in a single pass. The previous shape — one
    * read-coalesce-write job per day off a thread pool — paid fixed job
    * overhead O(#days); a year of partitions at production scale means
    * thousands of jobs, whereas this is one job regardless of partition
    * count (the same reason Iceberg's rewrite_data_files plans one job).
    * Swaps happen per-day only after the full rewrite succeeds, so a
    * mid-rewrite failure leaves every original partition intact. */
  def compact(spark: SparkSession, tableDir: String,
              maxFiles: Int = 4, targetFiles: Int = 1): Seq[String] = {
    import org.apache.spark.sql.functions._
    // a directory swap under a snapshot table would leave every manifest
    // pointing at deleted files — rewrites there go through the commit
    // log instead (same refuse-mixed-layouts rule as CdcWriter.write)
    require(!graft.lake.SnapshotLog.isSnapshotTable(spark, tableDir),
      s"$tableDir is snapshot-backed; rewrite via SnapshotLog.compact")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oversized = fileCounts(spark, tableDir).filter(_._2 > maxFiles).keys.toSeq.sorted
    if (oversized.isEmpty) return Seq.empty
    val pcol = SchemaBuilder.partitionColumn
    val tmpDir = new Path(root, ".compact_tmp")
    val pruned = spark.read.parquet(tableDir)
      .filter(col(pcol).cast("string").isin(oversized: _*))
    val clustered =
      if (targetFiles <= 1) pruned.repartition(col(pcol))
      else pruned.repartition(col(pcol),
        pmod(hash(pruned.columns.toIndexedSeq.map(col): _*), lit(targetFiles)))
    // A compaction rewrite is bandwidth-bound and reads exactly the tiny
    // files it exists to remove — pack them into big input splits for the
    // duration of this job instead of inheriting an analytics-tuned split
    // size (hundreds of 4 MB-open-cost tasks over 1 KB files is pure
    // scheduler overhead).
    val splitKey = "spark.sql.files.maxPartitionBytes"
    val prevSplit = spark.conf.getOption(splitKey)
    spark.conf.set(splitKey, (512L * 1024 * 1024).toString)
    try clustered.write.mode(SaveMode.Overwrite).partitionBy(pcol).parquet(tmpDir.toString)
    finally prevSplit match {
      case Some(v) => spark.conf.set(splitKey, v)
      case None => spark.conf.unset(splitKey)
    }
    // swap: remove originals, move compacted files in (single-FS
    // renames; Iceberg's snapshot commit makes this atomic for real)
    oversized.foreach { day =>
      val partDir = new Path(root, s"$pcol=$day")
      val newDir = new Path(tmpDir, s"$pcol=$day")
      fs.delete(partDir, true)
      fs.mkdirs(partDir)
      fs.listStatus(newDir)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .foreach(f => fs.rename(f.getPath, new Path(partDir, f.getPath.getName)))
    }
    fs.delete(tmpDir, true)
    oversized
  }
}
