package graft.ingest

import graft.model.SchemaBuilder
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retention cleanup for day-partitioned CDC tables.
  *
  * The reference deletes processed buffer rows older than a retention
  * window on a ticker (ref internal/cdc/buffer/postgres.go:218-234, loop
  * buffer/batch.go:351-382, default 7 d). For a day-partitioned lake
  * table the equivalent is dropping whole partition directories older
  * than the cutoff — an O(partitions) metadata operation, never a scan
  * (with Iceberg this is `expire_snapshots` / delete-where on the
  * partition column; on plain parquet dirs it is directory removal).
  */
object Retention {

  /** Delete day partitions strictly older than `cutoffDay` (yyyy-MM-dd).
    * Returns the dropped partition values. */
  def dropOlderThan(spark: SparkSession, tableDir: String, cutoffDay: String): Seq[String] = {
    val path = new Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    val prefix = SchemaBuilder.partitionColumn + "="
    val dropped = fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .filter(_.getName.stripPrefix(prefix) < cutoffDay)
    dropped.foreach(p => fs.delete(p, true))
    dropped.map(_.getName.stripPrefix(prefix)).sorted
  }

  /** Remaining day partitions (for assertions and monitoring). */
  def listDays(spark: SparkSession, tableDir: String): Seq[String] = {
    val path = new Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    val prefix = SchemaBuilder.partitionColumn + "="
    fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix))
      .sorted
  }
}
