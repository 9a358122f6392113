package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Checkpointed incremental consumer over the [[SnapshotLog]] — the
  * lake-as-streaming-SOURCE loop (Iceberg's streaming read of an
  * append table), which is how a downstream pipeline tails a table this
  * engine produces.
  *
  * Why not Spark's file streaming source pointed at the table dir: data
  * files exist BEFORE their snapshot commits (invisible-until-referenced
  * is the whole crash-safety model), so a directory tail would read
  * uncommitted and soon-to-be-expired debris. The consumer must advance
  * by SNAPSHOT, not by file — each poll reads exactly the rows the
  * commits since its checkpoint added ([[SnapshotLog.readIncremental]],
  * with its replace-skipping and expired-window/rewrite refusals).
  *
  * Delivery contract: the offset commits AFTER `process` returns, so a
  * crash inside a batch replays the WHOLE window — at-least-once with
  * whole-window replay, the same contract as Spark's offset log and the
  * reference's 10 s checkpoint re-delivery (ref internal/cdc/pipeline/
  * pipeline.go:152-156,218-222). An idempotent sink (overwrite-by-window,
  * MERGE) makes it exactly-once; the gate proves exactly that shape
  * through an injected crash.
  *
  * Offset storage mirrors the commit log's atomicity: `offset-<id>`
  * marker files, committed by rename, highest id wins. A crashed offset
  * write leaves a temp file that is never read.
  *
  * 100 TB notes: a poll's driver cost is O(new snapshots) manifest
  * parses + the id listing ([[SnapshotLog.resolveWindow]] parses only
  * the window); the data read is manifest-pruned to exactly the added
  * files. State on the consumer side is ONE long.
  */
object SnapshotConsumer {

  private val OffsetRe = "offset-(\\d+)".r

  /** Highest committed offset (snapshot id fully processed); 0 = none. */
  def lastProcessed(spark: SparkSession, ckptDir: String): Long = {
    val p = new Path(ckptDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).toSeq.flatMap(st => st.getPath.getName match {
      case OffsetRe(id) => Some(id.toLong)
      case _            => None
    }).maxOption.getOrElse(0L)
  }

  /** Commit an offset by atomic rename; prior markers are cleaned
    * opportunistically (resolution only needs the max, so leftovers are
    * noise, not a hazard). */
  def commitOffset(spark: SparkSession, ckptDir: String, id: Long): Unit = {
    val p = new Path(ckptDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val tmp = new Path(p, s".tmp-offset-${java.util.UUID.randomUUID()}")
    fs.create(tmp, false).close()
    val dst = new Path(p, s"offset-$id")
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"lost offset-commit race for $dst")
    }
    fs.listStatus(p).foreach { st =>
      st.getPath.getName match {
        case OffsetRe(old) if old.toLong < id => fs.delete(st.getPath, false)
        case _                                =>
      }
    }
  }

  /** One micro-batch: read the rows added in (lastProcessed, current],
    * hand them to `process` with the window bounds, then commit the
    * offset. Returns the processed window, or None when nothing new
    * committed since the checkpoint. */
  def pollOnce(spark: SparkSession, tableDir: String, ckptDir: String)
              (process: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = lastProcessed(spark, ckptDir)
    val to = SnapshotLog.currentSnapshot(spark, tableDir).map(_.id).getOrElse(0L)
    if (to <= from) return None
    val batch = SnapshotLog.readIncremental(spark, tableDir, from, to)
    process(batch, from, to)
    commitOffset(spark, ckptDir, to)
    Some((from, to))
  }
}
