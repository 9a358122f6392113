package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming semantics beyond the reference (SURVEY §2.5: philotes has no
  * watermark/window machinery — late events are appended as-is). These are
  * the extensions a streaming analytics consumer of the CDC tables needs,
  * built on Structured Streaming primitives.
  */
object StreamOps {

  /** Watermarked tumbling-window counts in append mode: a window is
    * emitted exactly once, when the watermark passes its end — the
    * streaming dual of the batch `q31_tumbling_window` query. */
  def tumblingCounts(events: DataFrame, tsCol: String,
                     watermarkDelay: String, windowDuration: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Per-key running state maintained across micro-batches with
    * mapGroupsWithState — the custom-state primitive (running event count
    * + latest timestamp per user; the shape of any incremental per-key
    * aggregate that outlives a single batch). */
  final case class UserActivity(userId: Long, nEvents: Long, lastTs: java.sql.Timestamp)

  def runningActivity(events: Dataset[(Long, java.sql.Timestamp)]): Dataset[UserActivity] = {
    implicit val stateEnc: Encoder[UserActivity] = Encoders.product[UserActivity]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_._1)
      .mapGroupsWithState[UserActivity, UserActivity](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(userId, 0L, new java.sql.Timestamp(0)))
          var n = prev.nEvents
          var last = prev.lastTs
          rows.foreach { case (_, ts) =>
            n += 1
            if (ts.after(last)) last = ts
          }
          val next = UserActivity(userId, n, last)
          state.update(next)
          next
      }
  }
}
