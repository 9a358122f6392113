package graft.extensions

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, per the large-scale
  * training-pipeline pattern.
  *
  * The testdata has no binary fixture, so a deterministic payload is
  * synthesized: mime assigned round-robin by doc_id; image/png blobs get
  * a VALID 33-byte PNG signature+IHDR header ([[Png]]) in front of the
  * UTF-8 text payload, with dimensions derived from the payload length
  * (so the DuckDB oracle can replay them arithmetically while the engine
  * genuinely parses them from container bytes). Everything downstream
  * treats the blob as opaque bytes — schema (binary + metadata struct),
  * partition-parallel decode (`mapPartitions` over the binary column, no
  * driver collection) and batch shape are the real 100 TB plumbing.
  */
object Multimodal extends QueryModule {

  /** Deterministic image dimensions for a payload of n bytes — the
    * values written INTO the PNG header at synthesis and replayed
    * arithmetically by the oracle. */
  def pngDims(n: Int): (Int, Int) = (16 + n % 624, 16 + (n * 7) % 464)

  /** Deterministic fake of an audio/video header decode.
    *
    * STUB: a real implementation would parse the container (WAV RIFF
    * chunk, MP4 moov atom) the way [[Png.parseIhdr]] does for PNG; no
    * codec libs are installed here. The stand-in derives plausible
    * dimensions purely from the byte length, so both engines (and the
    * DuckDB oracle) can replay it. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    val (width, height) = pngDims(n)
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

  /** The multimodal table: doc_id, blob (binary), meta (struct).
    * Synthesis runs partition-parallel in a typed map — the same batch
    * shape real container muxing would use. */
  def assets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, src) =>
        val payload = text.getBytes("UTF-8")
        val blob =
          if (id % 3 == 0) {
            val (w, h) = pngDims(payload.length)
            Png.header(w, h) ++ payload
          } else payload
        (id, blob, src)
      })
      .toDF("doc_id", "blob", "source")
      .select(col("doc_id"), col("blob"),
        struct(mime(col("doc_id")).as("mime"), col("source").as("origin")).as("meta"))
  }

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
       |  CAST(octet_length(encode(text)) +
       |    CASE WHEN doc_id % 3 = 0 THEN ${Png.HeaderLen} ELSE 0 END AS BIGINT) AS n_bytes
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ decode (real for PNG)

  /** Partition-parallel decode of every blob, then a per-mime rollup.
    * image/png is a REAL container parse — [[Png.parseIhdr]] reads
    * width/height out of the IHDR bytes (signature + CRC verified; a
    * malformed header fails loudly rather than guessing). wav/mp4 fall
    * back to [[decodeStub]]. The mapPartitions stage receives an iterator
    * of (id, bytes) per partition — exactly the batch shape a native
    * decoder (or GPU feature extractor) would consume. */
  private def decodeStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = assets(s, d)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, m, bytes) =>
        val (w, h, f) = m match {
          case "image/png" =>
            val (w, h) = Png.parseIhdr(bytes).getOrElse(
              throw new IllegalArgumentException(s"doc $id: invalid PNG header"))
            (w, h, 1L)
          case _ => decodeStub(bytes)
        }
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
       |    CASE WHEN doc_id % 3 = 0 THEN 1
       |         ELSE 1 + octet_length(encode(text)) // 256 END AS frames
       |  FROM documents)
       |SELECT mime, count(*) AS n_assets,
       |  round(avg(width), 4) AS avg_width,
       |  round(avg(height), 4) AS avg_height,
       |  CAST(sum(frames) AS BIGINT) AS total_frames,
       |  max(width) AS max_width
       |FROM decoded GROUP BY mime ORDER BY mime""".stripMargin

  // -------------------------------------------------------- resize planning

  private val FitBox = 224

  /** Resize-to-fit plan for every image asset: scale the long side to
    * [[FitBox]], keep aspect ratio with exact integer arithmetic
    * (short * FitBox / long, floor division — both engines agree), pad
    * the rest. The input dims are the REAL parsed IHDR values, the
    * standard front half of a vision-training preprocessing stage; the
    * oracle replays the arithmetic from the synthesis formulas. */
  private def resizePlan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dims = assets(s, d)
      .filter(col("meta.mime") === "image/png")
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h) = Png.parseIhdr(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid PNG header"))
        (id, w.toLong, h.toLong)
      })
      .toDF("doc_id", "width", "height")
    dims.select(
      col("doc_id"), col("width"), col("height"),
      when(col("width") >= col("height"), lit(FitBox.toLong))
        .otherwise(col("width") * FitBox / col("height"))
        .cast("long").as("out_w"),
      when(col("height") > col("width"), lit(FitBox.toLong))
        .otherwise(col("height") * FitBox / col("width"))
        .cast("long").as("out_h"))
      .withColumn("pad_x", lit(FitBox.toLong) - col("out_w"))
      .withColumn("pad_y", lit(FitBox.toLong) - col("out_h"))
      .orderBy(col("doc_id"))
  }

  private val resizePlanSql =
    s"""WITH dims AS (
       |  SELECT doc_id,
       |    CAST(16 + octet_length(encode(text)) % 624 AS BIGINT) AS width,
       |    CAST(16 + (octet_length(encode(text)) * 7) % 464 AS BIGINT) AS height
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT doc_id, width, height,
       |  CASE WHEN width >= height THEN $FitBox
       |       ELSE width * $FitBox // height END AS out_w,
       |  CASE WHEN height > width THEN $FitBox
       |       ELSE height * $FitBox // width END AS out_h,
       |  $FitBox - (CASE WHEN width >= height THEN $FitBox
       |       ELSE width * $FitBox // height END) AS pad_x,
       |  $FitBox - (CASE WHEN height > width THEN $FitBox
       |       ELSE height * $FitBox // width END) AS pad_y
       |FROM dims ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- frame sample

  private val FrameStep = 8

  /** Every FrameStep-th frame index of each video asset — the sampling
    * pattern of a frame-extraction stage (explode is partition-local; no
    * shuffle until a downstream agg). Videos carry no PNG header, so the
    * frame count is the stub's length-derived value. */
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
    GraftQuery("mm_resize_plan", resizePlan, Some(resizePlanSql)),
    GraftQuery("mm_frame_sample", frameSample, Some(frameSampleSql)),
  )
}
