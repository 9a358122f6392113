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

  /** Streaming exact dedup with bounded state: duplicates arriving within
    * the watermark horizon are dropped, and per-key state is evicted once
    * the watermark passes — the streaming dual of the batch exact-dedup
    * queries, and the only dedup shape whose state stays bounded on an
    * unbounded stream. Keyed on the content fingerprint column. */
  def dedupWithinWatermark(docs: DataFrame, tsCol: String, keyCol: String,
                           watermarkDelay: String): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Watermarked stream-stream inner join: each side keeps only the state
    * the time-bound condition can still match, so the join state is
    * bounded by the watermark horizon — the streaming dual of the batch
    * equi-joins (events enriched with the user's clicks within the
    * preceding hour). */
  def intervalJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("lts", "1 hour")
    val r = right.withWatermark("rts", "2 hours")
    l.join(r,
      col("l_user") === col("r_user") &&
        col("rts") >= col("lts") - expr("INTERVAL 1 HOUR") &&
        col("rts") <= col("lts"))
  }

  /** Watermarked session windows: per-user sessions close after `gap` of
    * inactivity and are emitted once the watermark passes — the streaming
    * dual of the batch `q32_sessionize` query (which derives the same
    * sessions with a lag-window over the full history). State per open
    * session only; merged sessions are native (`session_window` merges
    * overlapping windows at the state store, not in user code). */
  def sessionCounts(events: DataFrame, tsCol: String, userCol: String,
                    watermarkDelay: String, gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

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
