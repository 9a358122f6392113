package graft.extensions

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, per the large-scale
  * training-pipeline pattern (the real decode libraries are not in this
  * container — see [[Multimodal.decodeStub]]).
  *
  * The testdata has no binary fixture, so a deterministic payload is
  * synthesized: blob = UTF-8 bytes of `text`, mime assigned round-robin by
  * doc_id. Everything downstream of the synthesis treats the blob as
  * opaque bytes — the schema (binary + metadata struct), partition-parallel
  * decode (`mapPartitions` over the binary column, no driver collection)
  * and batch shape are the real 100 TB plumbing; only the pixel/sample
  * decoding is faked.
  */
object Multimodal extends QueryModule {

  /** Deterministic fake of an image/audio/video header decode.
    *
    * STUB: a real implementation would parse the container format (PNG
    * header, WAV RIFF chunk, MP4 moov atom) with a native decoder; none are
    * installed here. The stand-in derives plausible dimensions purely from
    * the byte length, so both engines (and the DuckDB oracle) can replay it.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    val width = 16 + n % 624
    val height = 16 + (n * 7) % 464
    val frames = 1L + n / 256
    (width, height, frames)
  }

  /** Round-robin mime assignment (the fixture has no real containers). */
  def mime(docId: Column): Column =
    when(docId % 3 === 0, "image/png")
      .when(docId % 3 === 1, "audio/wav")
      .otherwise("video/mp4")

  private val mimeSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |     WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |     ELSE 'video/mp4' END""".stripMargin

  /** The multimodal table: doc_id, blob (binary), meta (struct). */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      struct(
        mime(col("doc_id")).as("mime"),
        col("source").as("origin")).as("meta"))

  // ------------------------------------------------------------- metadata

  private def blobMeta(s: SparkSession, d: String): DataFrame =
    assets(s, d).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.origin").as("origin"),
      length(col("blob")).cast("bigint").as("n_bytes"))
      .orderBy(col("doc_id"))

  private val blobMetaSql =
    s"""SELECT doc_id, $mimeSql AS mime, source AS origin,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------- decode (stubbed) + stats

  /** Partition-parallel decode of every blob via [[decodeStub]], then a
    * per-mime rollup. The mapPartitions stage is the genuine article: it
    * receives an iterator of (id, bytes) per partition — exactly the batch
    * shape a native decoder (or GPU feature extractor) would consume. */
  private def decodeStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = assets(s, d)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, m, bytes) =>
        val (w, h, f) = decodeStub(bytes)
        (id, m, w, h, f)
      })
      .toDF("doc_id", "mime", "width", "height", "frames")
    decoded.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_assets"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        sum(col("frames")).as("total_frames"),
        max(col("width")).cast("bigint").as("max_width"))
      .orderBy(col("mime"))
  }

  private val decodeStatsSql =
    s"""WITH decoded AS (
       |  SELECT doc_id, $mimeSql AS mime,
       |    16 + octet_length(encode(text)) % 624 AS width,
       |    16 + (octet_length(encode(text)) * 7) % 464 AS height,
       |    1 + octet_length(encode(text)) // 256 AS frames
       |  FROM documents)
       |SELECT mime, count(*) AS n_assets,
       |  round(avg(width), 4) AS avg_width,
       |  round(avg(height), 4) AS avg_height,
       |  CAST(sum(frames) AS BIGINT) AS total_frames,
       |  max(width) AS max_width
       |FROM decoded GROUP BY mime ORDER BY mime""".stripMargin

  // ----------------------------------------------------------- frame sample

  private val FrameStep = 8

  /** Every FrameStep-th frame index of each video asset — the sampling
    * pattern of a frame-extraction stage (explode is partition-local; no
    * shuffle until a downstream agg). */
  private def frameSample(s: SparkSession, d: String): DataFrame = {
    val decoded = assets(s, d).select(
      col("doc_id"), col("meta.mime").as("mime"),
      (lit(1L) + (length(col("blob")) / lit(256)).cast("long")).as("frames"))
    decoded.filter(col("mime") === "video/mp4")
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("frames") - 1, lit(FrameStep.toLong))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameSampleSql =
    s"""WITH decoded AS (
       |  SELECT doc_id, $mimeSql AS mime,
       |    1 + octet_length(encode(text)) // 256 AS frames
       |  FROM documents)
       |SELECT doc_id, CAST(unnest(range(0, frames, $FrameStep)) AS BIGINT) AS frame_idx
       |FROM decoded WHERE mime = 'video/mp4'
       |ORDER BY doc_id, frame_idx""".stripMargin

  override def all: Seq[GraftQuery] = Seq(
    GraftQuery("mm_blob_meta", blobMeta, Some(blobMetaSql)),
    GraftQuery("mm_decode_stats", decodeStats, Some(decodeStatsSql)),
    GraftQuery("mm_frame_sample", frameSample, Some(frameSampleSql)),
  )
}
