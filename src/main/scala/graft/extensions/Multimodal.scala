package graft.extensions

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as
  * opaque `binary` columns plus typed metadata, per the large-scale
  * training-pipeline pattern.
  *
  * The testdata has no binary fixture, so a deterministic payload is
  * synthesized: mime assigned round-robin by doc_id, and EVERY blob gets
  * a VALID container prefix — PNG signature+IHDR ([[Png]]), RIFF/WAVE
  * fmt+data ([[Wav]]), or MP4 ftyp+mvhd ([[Mp4]]) — in front of the
  * UTF-8 text payload. Header fields are derived from the payload length
  * at synthesis (so the DuckDB oracle can replay them arithmetically)
  * while the engine genuinely parses them back out of container bytes:
  * signature/box/CRC checks and all. Everything downstream treats the
  * blob as opaque bytes — schema (binary + metadata struct),
  * partition-parallel decode (`mapPartitions` over the binary column, no
  * driver collection) and batch shape are the real 100 TB plumbing.
  */
object Multimodal extends QueryModule {

  /** Deterministic image dimensions for a payload of n bytes — the
    * values written INTO the PNG header at synthesis and replayed
    * arithmetically by the oracle. */
  def pngDims(n: Int): (Int, Int) = (16 + n % 624, 16 + (n * 7) % 464)

  /** Deterministic audio params for a payload of n bytes: 1-2 channels,
    * a standard sample rate, 16-bit PCM, n bytes of sample data. */
  def wavParams(n: Int): (Int, Int) = {
    val channels = 1 + n % 2
    val rate = (n % 5) match {
      case 0 => 8000
      case 1 => 16000
      case 2 => 22050
      case 3 => 44100
      case _ => 48000
    }
    (channels, rate)
  }

  /** Deterministic movie params for a payload of n bytes: the classic
    * 600-tick QuickTime timescale, 3n ticks of duration. */
  val Mp4Timescale = 600
  def mp4Duration(n: Int): Int = 3 * n

  /** Nominal frame rate used to turn mvhd duration into a frame count. */
  val Fps = 24

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
        val n = payload.length
        val header = (id % 3) match {
          case 0 =>
            val (w, h) = pngDims(n)
            Png.header(w, h)
          case 1 =>
            val (ch, sr) = wavParams(n)
            Wav.header(ch, sr, n)
          case _ =>
            Mp4.header(Mp4Timescale, mp4Duration(n))
        }
        (id, header ++ payload, src)
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
       |    CASE WHEN doc_id % 3 = 0 THEN ${Png.HeaderLen}
       |         WHEN doc_id % 3 = 1 THEN ${Wav.HeaderLen}
       |         ELSE ${Mp4.HeaderLen} END AS BIGINT) AS n_bytes
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- decode (real)

  /** Partition-parallel decode of every blob, then a per-mime rollup.
    * ALL THREE mimes are REAL container parses — [[Png.parseIhdr]] reads
    * width/height out of IHDR (CRC verified), [[Wav.parseFmt]] walks the
    * RIFF chunks, [[Mp4.parseMvhd]] box-walks to the movie header; a
    * malformed container fails loudly rather than guessing. "frames" is
    * the modality's natural frame count: 1 per image, PCM sample frames
    * for audio, duration x [[Fps]] for video. width/height are 0 for
    * non-images (mvhd carries no dims — true to the format). The
    * mapPartitions stage receives an iterator of (id, bytes) per
    * partition — exactly the batch shape a native decoder (or GPU
    * feature extractor) would consume. */
  private def decodeStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = assets(s, d)
      .select(col("doc_id"), col("meta.mime").as("mime"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, m, bytes) =>
        def bad = throw new IllegalArgumentException(s"doc $id: invalid $m container")
        val (w, h, f) = m match {
          case "image/png" =>
            val (w, h) = Png.parseIhdr(bytes).getOrElse(bad)
            (w, h, 1L)
          case "audio/wav" =>
            val fmt = Wav.parseFmt(bytes).getOrElse(bad)
            (0, 0, fmt.dataLen.toLong / (fmt.channels * fmt.bitsPerSample / 8))
          case _ =>
            val mvhd = Mp4.parseMvhd(bytes).getOrElse(bad)
            (0, 0, 1L + mvhd.duration * Fps / mvhd.timescale)
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
       |  SELECT doc_id, $mimeSql AS mime, octet_length(encode(text)) AS n
       |  FROM documents), fields AS (
       |  SELECT mime,
       |    CASE WHEN mime = 'image/png' THEN 16 + n % 624 ELSE 0 END AS width,
       |    CASE WHEN mime = 'image/png' THEN 16 + (n * 7) % 464 ELSE 0 END AS height,
       |    CASE WHEN mime = 'image/png' THEN 1
       |         WHEN mime = 'audio/wav' THEN n // ((1 + n % 2) * 2)
       |         ELSE 1 + (3 * n * $Fps) // $Mp4Timescale END AS frames
       |  FROM decoded)
       |SELECT mime, count(*) AS n_assets,
       |  round(avg(width), 4) AS avg_width,
       |  round(avg(height), 4) AS avg_height,
       |  CAST(sum(frames) AS BIGINT) AS total_frames,
       |  max(width) AS max_width
       |FROM fields GROUP BY mime ORDER BY mime""".stripMargin

  // ------------------------------------------------------------ audio stats

  /** Per-(channels, sample_rate) rollup over REAL parsed WAV headers —
    * the profiling pass an audio-training pipeline runs before deciding
        * resample targets. duration_ms floors per asset (integer SQL). */
  private def audioStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val parsed = assets(s, d)
      .filter(col("meta.mime") === "audio/wav")
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val fmt = Wav.parseFmt(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid WAV header"))
        (id, fmt.channels, fmt.sampleRate, fmt.dataLen.toLong, fmt.durationMs)
      })
      .toDF("doc_id", "channels", "sample_rate", "data_bytes", "duration_ms")
    parsed.groupBy(col("channels"), col("sample_rate"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("data_bytes")).as("total_bytes"),
        sum(col("duration_ms")).as("total_ms"),
        max(col("duration_ms")).as("max_ms"))
      .orderBy(col("channels"), col("sample_rate"))
  }

  private val audioStatsSql =
    s"""WITH parsed AS (
       |  SELECT 1 + n % 2 AS channels,
       |    CASE n % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
       |               WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
       |    n AS data_bytes
       |  FROM (SELECT octet_length(encode(text)) AS n
       |        FROM documents WHERE doc_id % 3 = 1)), timed AS (
       |  SELECT channels, sample_rate, data_bytes,
       |    (data_bytes * 1000) // (sample_rate * channels * 2) AS duration_ms
       |  FROM parsed)
       |SELECT CAST(channels AS INT) AS channels, CAST(sample_rate AS INT) AS sample_rate,
       |  count(*) AS n_assets,
       |  CAST(sum(data_bytes) AS BIGINT) AS total_bytes,
       |  CAST(sum(duration_ms) AS BIGINT) AS total_ms,
       |  CAST(max(duration_ms) AS BIGINT) AS max_ms
       |FROM timed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ video stats

  /** Corpus-level rollup over REAL parsed mvhd movie headers. */
  private def videoStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val parsed = assets(s, d)
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Mp4.parseMvhd(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid MP4 header"))
        (id, m.timescale, m.duration, m.durationMs)
      })
      .toDF("doc_id", "timescale", "duration_ticks", "duration_ms")
    parsed.agg(
      count(lit(1)).as("n_assets"),
      countDistinct(col("timescale")).as("n_timescales"),
      sum(col("duration_ms")).as("total_ms"),
      round(avg(col("duration_ms")), 4).as("avg_ms"),
      max(col("duration_ticks")).as("max_ticks"))
  }

  private val videoStatsSql =
    s"""WITH parsed AS (
       |  SELECT $Mp4Timescale AS timescale, 3 * n AS duration_ticks,
       |    (3 * n * 1000) // $Mp4Timescale AS duration_ms
       |  FROM (SELECT octet_length(encode(text)) AS n
       |        FROM documents WHERE doc_id % 3 = 2))
       |SELECT count(*) AS n_assets,
       |  count(DISTINCT timescale) AS n_timescales,
       |  CAST(sum(duration_ms) AS BIGINT) AS total_ms,
       |  round(avg(duration_ms), 4) AS avg_ms,
       |  CAST(max(duration_ticks) AS BIGINT) AS max_ticks
       |FROM parsed""".stripMargin

  // ------------------------------------------------------------ audio levels

  /** Per-asset level statistics over REALLY DECODED 16-bit PCM samples
    * ([[Wav.decodeSamples]]: chunk walk to the data payload, little-endian
    * sample reconstruction with sign handling) — the normalize/clipping
    * profile an audio pipeline computes before featurization. All stats
    * are exact integers except the final rounded mean, so the oracle
    * replays them from the payload bytes (the fixture corpus is pure
    * ASCII, so DuckDB's char codes ARE the bytes). Cross-validated
    * against the JDK's independent javax.sound WAV reader in
    * MultimodalSpec. */
  private val ClipBar = 32000L

  private def audioLevels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .filter(col("meta.mime") === "audio/wav")
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val fmt = Wav.parseFmt(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid WAV header"))
        val samples = Wav.decodeSamples(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: undecodable PCM"))
        var sumAbs = 0L; var peak = 0L; var clipped = 0L
        var i = 0
        while (i < samples.length) {
          val a = math.abs(samples(i)).toLong
          sumAbs += a
          if (a > peak) peak = a
          if (a >= ClipBar) clipped += 1
          i += 1
        }
        (id, fmt.channels, samples.length.toLong, sumAbs, peak, clipped)
      })
      .toDF("doc_id", "channels", "n_samples", "sum_abs", "peak", "n_clipped")
      .select(col("doc_id"), col("channels"), col("n_samples"),
        when(col("n_samples") === 0, lit(0.0))
          .otherwise(round(col("sum_abs") * lit(1.0) / col("n_samples"), 4))
          .as("mean_level"),
        col("peak"), col("n_clipped"))
      .orderBy(col("doc_id"))
  }

  private val audioLevelsSql =
    s"""WITH wav AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS n,
       |    1 + octet_length(encode(text)) % 2 AS channels
       |  FROM documents WHERE doc_id % 3 = 1),
       |decoded AS (
       |  SELECT doc_id, channels, n // 2 AS n_samples,
       |    list_transform(range(0, n // 2), i ->
       |      CASE WHEN unicode(substr(text, CAST(2*i+1 AS INT), 1)) +
       |                256 * unicode(substr(text, CAST(2*i+2 AS INT), 1)) >= 32768
       |           THEN abs(unicode(substr(text, CAST(2*i+1 AS INT), 1)) +
       |                256 * unicode(substr(text, CAST(2*i+2 AS INT), 1)) - 65536)
       |           ELSE unicode(substr(text, CAST(2*i+1 AS INT), 1)) +
       |                256 * unicode(substr(text, CAST(2*i+2 AS INT), 1)) END) AS amps
       |  FROM wav)
       |SELECT doc_id, CAST(channels AS INT) AS channels,
       |  CAST(n_samples AS BIGINT) AS n_samples,
       |  CASE WHEN n_samples = 0 THEN 0.0
       |       ELSE round(CAST(list_sum(amps) AS BIGINT) * 1.0 / n_samples, 4)
       |  END AS mean_level,
       |  CAST(COALESCE(list_max(amps), 0) AS BIGINT) AS peak,
       |  CAST(len(list_filter(amps, a -> a >= $ClipBar)) AS BIGINT) AS n_clipped
       |FROM decoded ORDER BY doc_id""".stripMargin

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
    * pattern of a frame-extraction stage. Frame counts come from the
    * REAL parsed mvhd (duration x [[Fps]]); explode is partition-local,
    * no shuffle until a downstream agg. */
  private def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded = assets(s, d)
      .filter(col("meta.mime") === "video/mp4")
      .select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = Mp4.parseMvhd(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid MP4 header"))
        (id, 1L + m.duration * Fps / m.timescale)
      })
      .toDF("doc_id", "frames")
    decoded
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("frames") - 1, lit(FrameStep.toLong))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val frameSampleSql =
    s"""WITH decoded AS (
       |  SELECT doc_id, 1 + (3 * octet_length(encode(text)) * $Fps) // $Mp4Timescale AS frames
       |  FROM documents WHERE doc_id % 3 = 2)
       |SELECT doc_id, CAST(unnest(range(0, frames, $FrameStep)) AS BIGINT) AS frame_idx
       |FROM decoded
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------------------------ pixel stats

  /** Dims for the full-pixel PNG fixtures — small (≤ 63 × 47, ~9 KB of
    * raw RGB) so the complete corpus encodes/decodes in seconds, unlike
    * the header-only dims of [[pngDims]] which never carry pixel data. */
  def pixelDims(n: Int): (Int, Int) = (8 + n % 56, 8 + (n * 3) % 40)

  /** Per-image pixel seed derived from the payload length. */
  def pixelSeed(n: Int): Int = n % 251

  /** The deterministic pixel formula both the encoder and the DuckDB
    * oracle evaluate: channel c of pixel (x, y). */
  def pixelValue(x: Int, y: Int, c: Int, seed: Int): Int =
    (5 * x + 3 * y + 37 * c + seed) % 256

  /** COMPLETE PNGs (IHDR + compressed IDAT + IEND) for every image-mime
    * doc — real pixels, really deflated, filter types rotating through
    * all five per scanline. Partition-parallel; nothing but the formula
    * params derives from the doc, so the oracle replays it all. */
  private def pixelPngs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val n = text.getBytes("UTF-8").length
        val (w, h) = pixelDims(n)
        val seed = pixelSeed(n)
        (id, Png.encodeRgb(w, h, (x, y, c) => pixelValue(x, y, c, seed)))
      })
      .toDF("doc_id", "blob")
  }

  /** Per-image, per-channel pixel statistics over REAL decoded pixels —
    * IDAT inflated with the JDK Inflater, scanlines unfiltered, every
    * byte of every channel aggregated in one partition-parallel pass (the
    * normalize-stats pass a vision pipeline runs before training). The
    * oracle recomputes mean/min/max from the pixel formula over an
    * enumerated (x, y) grid — so a wrong filter reversal, a dropped
    * scanline, or an off-by-one in the inflate loop shifts a mean and
    * fails the hash. */
  private def pixelStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stats = pixelPngs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dec = Png.decodeRgb(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid PNG"))
        val sums = new Array[Long](3)
        val mins = Array.fill(3)(255L)
        val maxs = new Array[Long](3)
        val px = dec.pixels
        var i = 0
        while (i < px.length) {
          val c = i % 3
          val v = px(i) & 0xff
          sums(c) += v
          if (v < mins(c)) mins(c) = v
          if (v > maxs(c)) maxs(c) = v
          i += 1
        }
        (id, dec.width, dec.height,
          sums(0), mins(0), maxs(0),
          sums(1), mins(1), maxs(1),
          sums(2), mins(2), maxs(2))
      })
      .toDF("doc_id", "width", "height",
        "sum_r", "min_r", "max_r", "sum_g", "min_g", "max_g",
        "sum_b", "min_b", "max_b")
    val npx = col("width").cast("double") * col("height")
    stats.select(
      col("doc_id"), col("width"), col("height"),
      round(col("sum_r") / npx, 4).as("mean_r"), col("min_r"), col("max_r"),
      round(col("sum_g") / npx, 4).as("mean_g"), col("min_g"), col("max_g"),
      round(col("sum_b") / npx, 4).as("mean_b"), col("min_b"), col("max_b"))
      .orderBy(col("doc_id"))
  }

  private val pixelStatsSql =
    """WITH png AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 3 = 0),
      |dims AS (
      |  SELECT doc_id, 8 + n % 56 AS w, 8 + (n * 3) % 40 AS h, n % 251 AS s
      |  FROM png),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (5 * (i % w) + 3 * (i // w) + s) % 256 AS r,
      |    (5 * (i % w) + 3 * (i // w) + 37 + s) % 256 AS g,
      |    (5 * (i % w) + 3 * (i // w) + 74 + s) % 256 AS b
      |  FROM (SELECT doc_id, w, h, s, unnest(range(0, w * h)) AS i FROM dims))
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  round(avg(r), 4) AS mean_r, CAST(min(r) AS BIGINT) AS min_r, CAST(max(r) AS BIGINT) AS max_r,
      |  round(avg(g), 4) AS mean_g, CAST(min(g) AS BIGINT) AS min_g, CAST(max(g) AS BIGINT) AS max_g,
      |  round(avg(b), 4) AS mean_b, CAST(min(b) AS BIGINT) AS min_b, CAST(max(b) AS BIGINT) AS max_b
      |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- real pixel resize

  /** Output edge of the nearest-neighbor thumbnail. */
  private val ResizeTo = 8

  /** REAL nearest-neighbor resize over decoded pixels — the thumbnail /
    * normalize-to-model-input stage of a vision pipeline, downstream of
    * the real decode (mm_resize_plan computes the geometry; this one
    * moves the bytes). Output pixel (ox, oy) samples source
    * (ox·w/T, oy·h/T) from the UNFILTERED pixel array; the result row
    * carries exact-integer channel sums plus a position-weighted
    * checksum, so a transposed axis, a wrong stride, or an off-by-one in
    * the sampling lands on different integers and fails the hash. The
    * oracle replays the synthesis formula at the same sampled
    * coordinates — it never decodes, so decoder and oracle stay
    * independent. Partition-parallel mapPartitions kernel, one exchange
    * (the presentation sort) — at 100 TB the decode+resize cost is
    * per-row CPU on the scan side. */
  private def resizePixels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pixelPngs(s, d).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dec = Png.decodeRgb(bytes).getOrElse(
          throw new IllegalArgumentException(s"doc $id: invalid PNG"))
        val (w, h) = (dec.width, dec.height)
        val px = dec.pixels
        val sums = new Array[Long](3)
        var wsum = 0L
        var oy = 0
        while (oy < ResizeTo) {
          val sy = oy * h / ResizeTo
          var ox = 0
          while (ox < ResizeTo) {
            val sx = ox * w / ResizeTo
            var c = 0
            while (c < 3) {
              val v = px((sy * w + sx) * 3 + c) & 0xff
              sums(c) += v
              wsum += (oy * ResizeTo + ox + 1).toLong * v
              c += 1
            }
            ox += 1
          }
          oy += 1
        }
        (id, sums(0), sums(1), sums(2), wsum)
      })
      .toDF("doc_id", "sum_r", "sum_g", "sum_b", "wsum")
      .orderBy(col("doc_id"))
  }

  private val resizePixelsSql =
    """WITH png AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n
      |  FROM documents WHERE doc_id % 3 = 0),
      |dims AS (
      |  SELECT doc_id, 8 + n % 56 AS w, 8 + (n * 3) % 40 AS h, n % 251 AS s
      |  FROM png),
      |px AS (
      |  SELECT d.doc_id, oy.range AS oy, ox.range AS ox, c.range AS c,
      |    (5 * ((ox.range * d.w) // 8) + 3 * ((oy.range * d.h) // 8)
      |      + 37 * c.range + d.s) % 256 AS v
      |  FROM dims d, range(8) oy, range(8) ox, range(3) c)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
      |  CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
      |  CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b,
      |  CAST(sum((oy * 8 + ox + 1) * v) AS BIGINT) AS wsum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------- perceptual-hash image near-dup

  /** dHash geometry: an 8×8 nearest-neighbor sample grid (the same
    * sampling as [[resizePixels]]), 7 horizontal-gradient comparisons per
    * row → a 56-bit hash. 56 (not the classic 64) keeps every banded
    * arithmetic step inside a POSITIVE signed 64-bit value on both
    * engines — DuckDB has no unsigned shift-out semantics to lean on. */
  private val PhGrid = 8
  private val PhBits = 56
  private val PhBandBits = 14
  private val PhBands = PhBits / PhBandBits // 4
  /** Hamming threshold; < PhBands, so a qualifying pair must share at
    * least one exact band (pigeonhole) — perfect recall at the cutoff. */
  private val PhHamMax = 3

  /** 56-bit difference hash per image over REAL decoded pixels: decode
    * ([[Png.decodeRgb]] — inflate + unfilter), sample the 8×8 grid
    * nearest-neighbor, and set bit (oy·7+ox) iff the channel-sum
    * brightness increases from grid column ox to ox+1. The gradient-sign
    * encoding is what makes it PERCEPTUAL: uniform brightness/contrast
    * changes and resampling preserve the signs, so re-encoded or resized
    * variants of one image land within a few bits of each other (public
    * aHash/dHash folklore, e.g. the pHash project). Partition-parallel
    * kernel; persisted per (session, dir) — three registered queries
    * consume it. */
  private val phashCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  /** Verified neighbor-pair sets per (session, dir, kind, bound): the
    * banded join runs ONCE per modality and both its consumers (the
    * star decision list and the distance histogram) read the persisted
    * result — pair sets are decision-sized (bounded by the near-dup
    * mass, not the corpus), so the pin is cheap and the join never
    * re-runs per query. Same discipline as TextAnalysis.lmDocScores. */
  private val neighCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String, Long), DataFrame]

  def invalidateCaches(): Unit = {
    graft.CacheFill.invalidate(phashCache)(_.unpersist())
    graft.CacheFill.invalidate(neighCache)(_.unpersist())
  }

  /** The per-image kernel, exposed for the spec's perceptual-property
    * tests (brightness invariance, brute-force completeness). */
  private[graft] def phash56(w: Int, h: Int, px: Array[Byte]): Long = {
    var ph = 0L
    var oy = 0
    while (oy < PhGrid) {
      val sy = oy * h / PhGrid
      var prev = 0
      var ox = 0
      while (ox < PhGrid) {
        val sx = ox * w / PhGrid
        val base = (sy * w + sx) * 3
        val g = (px(base) & 0xff) + (px(base + 1) & 0xff) +
          (px(base + 2) & 0xff)
        if (ox > 0 && g > prev)
          ph |= 1L << (oy * (PhGrid - 1) + ox - 1)
        prev = g
        ox += 1
      }
      oy += 1
    }
    ph
  }

  /** Session conf: when "true", an undecodable blob fails the hash
    * stage loudly — the posture for the synthesized fixture, where a
    * decode failure IS an engine bug. Default is the crawl posture:
    * route the blob to the counted reject frame ([[decodeRejects]], the
    * DLQ discipline of [[graft.reliability.DeadLetter]]) and keep
    * hashing the rest — one corrupt image must not kill a corpus-wide
    * dedup pass. */
  private[graft] val StrictDecodeConf = "graft.multimodal.strictDecode"

  /** One pass over the blobs: (doc_id, ph) with ph NULL for
    * undecodables; persisted per (session, dir, kind + decode posture)
    * — the dup/hist/incremental queries read the valid rows,
    * [[decodeRejects]] the null ones, from the same frame. The strict
    * flag is part of the KEY because it changes the frame's behavior
    * (throw vs null-route): flipping the conf mid-session must not be
    * silently ignored by a frame cached under the other posture. */
  private def decodedHashes(s: SparkSession, d: String, kind: String,
                            blobs: (SparkSession, String) => DataFrame,
                            hash: (Long, Array[Byte]) => Option[Long]): DataFrame = {
    val posture =
      if (s.conf.get(StrictDecodeConf, "false") == "true") "strict" else "lenient"
    graft.CacheFill(phashCache, (graft.SessionKeys(s), d, s"$kind|$posture"))(
      hashFrame(s, blobs(s, d), kind, hash).persist())
  }

  /** Uncached single pass blob → nullable hash; exposed so the spec can
    * feed a corrupted blob through the exact dedup pipeline. */
  private[graft] def hashFrame(s: SparkSession, blobs: DataFrame, kind: String,
                               hash: (Long, Array[Byte]) => Option[Long]): DataFrame = {
    import s.implicits._
    val strict = s.conf.get(StrictDecodeConf, "false") == "true"
    blobs.as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val h = hash(id, bytes)
        if (strict && h.isEmpty) throw new IllegalArgumentException(
          s"doc $id: undecodable $kind blob")
        (id, h.map(java.lang.Long.valueOf).orNull)
      })
      .toDF("doc_id", "ph")
  }

  /** The per-modality decode+hash kernels, keyed like the cache. An
    * unknown kind fails fast — a typo must not silently box-walk
    * arbitrary blobs as MP4s and read back as 100% decode rejects. */
  private[graft] def hashKernel(kind: String): (Long, Array[Byte]) => Option[Long] =
    kind match {
      case "image" => (_, b) => Png.decodeRgb(b)
        .map(dec => phash56(dec.width, dec.height, dec.pixels))
      case "audio" => (_, b) => Wav.decodeSamples(b).map(audioHash56)
      case "video" => (_, b) => videoHash56(b)
      case other   => throw new IllegalArgumentException(
        s"unknown modality kind '$other' (image/audio/video)")
    }

  /** doc_ids whose blob failed the perceptual-hash decode (empty on the
    * fixture corpus; fed by the crawl posture above). */
  private[graft] def decodeRejects(s: SparkSession, d: String,
                                   kind: String): DataFrame =
    (kind match {
      case "image" => phashes(s, d)
      case "audio" => audioHashes(s, d)
      case "video" => videoHashes(s, d)
      case other   => throw new IllegalArgumentException(
        s"unknown modality kind '$other' (image/audio/video)")
    }).filter(col("ph").isNull).select(col("doc_id"))

  private def phashes(s: SparkSession, d: String): DataFrame =
    decodedHashes(s, d, "image", pixelPngs, hashKernel("image"))

  /** DISTINCT near-dup neighbor pairs (doc_id > dup_of) from the banded
    * Hamming-bucket join: each hash splits into 4 bands of 14 bits, the
    * candidate join is an equi-join on (band index, band value) — never
    * all-pairs — and candidates verify by exact popcount of the XOR.
    * Same layout as [[Dedup.simhashPairs]]. Scale shape: each image
    * shuffles 4 band rows; a bucket's cost is quadratic in its size, and
    * dHash bands (gradient signs) are corpus-dependent — the bucket
    * histogram is spec-pinned AND the operator now defends itself: any
    * (band, value) bucket above [[BucketBoundConf]] is re-keyed by
    * sub-bands of its remaining bits (see [[hammingNeighborsBounded]]),
    * splitting the quadratic bucket ~4× per level while keeping
    * pigeonhole completeness. */
  private def phashNeighbors(s: SparkSession, d: String): DataFrame =
    cachedNeighbors(s, d, "image", phashes(s, d))

  private[graft] val BucketBoundConf = "graft.multimodal.bucketBound"
  private val DefaultBucketBound = 4096L

  private def cachedNeighbors(s: SparkSession, d: String, kind: String,
                              hashes: => DataFrame): DataFrame = {
    val bound =
      s.conf.get(BucketBoundConf, DefaultBucketBound.toString).toLong
    graft.CacheFill(neighCache, (graft.SessionKeys(s), d, kind, bound))(
      hammingNeighborsBounded(hashes, bound).persist())
  }

  private def bandCols(ph: Column): Seq[Column] =
    (0 until PhBands).map(j =>
      shiftright(ph, j * PhBandBits) % lit(1 << PhBandBits))

  /** Verified pairs from a self equi-join of `bands` on `keys`. */
  private def bandPairs(bands: DataFrame, keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && col("a.doc_id") > col("b.doc_id")
    bands.alias("a").join(bands.alias("b"), cond)
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("bigint")
          .as("hamming"))
      .filter(col("hamming") <= PhHamMax)
  }

  /** The hash's 42 bits OUTSIDE band `j`, as one packed value. */
  private def remBits(ph: Column, j: Int): Column =
    shiftleft(shiftright(ph, (j + 1) * PhBandBits), j * PhBandBits)
      .bitwiseOR(ph % lit(1L << (j * PhBandBits)))

  /** Sub-band widths over the 42 remaining bits: [[PhHamMax]] + 1 = 4
    * sub-bands, so <= 3 differing bits leave >= 1 sub-band equal —
    * the same pigeonhole, one level down. */
  private val SubWidths = Seq(11, 11, 10, 10)

  private def subBandCols(rem: Column): Seq[Column] = {
    val offs = SubWidths.scanLeft(0)(_ + _)
    SubWidths.zip(offs).map { case (wd, off) =>
      shiftright(rem, off) % lit(1 << wd)
    }
  }

  /** The banded join with the bucket-overflow DEFENSE. Bucket sizes are
    * measured first — a groupBy over (band, value), map-side partial
    * and INTRINSICALLY bounded output (4 bands × 2^14 values = 65 536
    * rows max, whatever the corpus size) — and a driver-side probe asks
    * whether ANY bucket exceeds `bound`:
    *
    *  - No (the overwhelmingly common case): the plan IS the plain
    *    banded equi-join; the defense costs one metadata-sized
    *    aggregate job and nothing in the join itself.
    *  - Yes: rows in bounded buckets join on (band, value) as usual;
    *    rows in OVERSIZED buckets additionally split by sub-bands of
    *    their remaining 42 bits and join on (band, value, sub-band,
    *    sub-value). A qualifying pair (Hamming <= [[PhHamMax]] = 3)
    *    sharing an oversized band has <= 3 differing bits spread over
    *    4 sub-bands, so at least one sub-band still matches — recall
    *    stays perfect while the hot bucket's quadratic mass drops by
    *    the sub-bucket split (recursively ~16x smaller buckets). The
    *    bucket-key frames broadcast (<= 65 536 rows by construction).
    *
    * Exposed with an explicit bound for the spec's forced-overflow
    * completeness gate. */
  /** Bucket classification for a bands frame: ONE aggregate job (the
    * output is intrinsically <= 4 x 2^14 rows, so the driver holds it
    * whole), split locally into (bounded bands, sub-banded hot bands).
    * None = no bucket exceeds `bound` — the caller keeps its plain
    * plan. The hot side carries the extra (sb, sbv) key over the 42
    * bits OUTSIDE the hot band. */
  private def splitByBucketBound(bands: DataFrame,
                                 bound: Long): Option[(DataFrame, DataFrame)] = {
    val s = bands.sparkSession
    import s.implicits._
    val sizes = bands.groupBy(col("b"), col("bv"))
      .agg(count(lit(1)).as("bn"))
      .as[(Int, Long, Long)].collect() // bounded by construction
    val hot = sizes.filter(_._3 > bound).map { case (b, bv, _) => (b, bv) }
    if (hot.isEmpty) return None
    val hotDf = broadcast(hot.toSeq.toDF("b", "bv"))
    val okDf = broadcast(sizes.filter(_._3 <= bound)
      .map { case (b, bv, _) => (b, bv) }.toSeq.toDF("b", "bv"))
    val rem = (0 until PhBands).foldLeft(lit(0L)) { (acc, j) =>
      when(col("b") === j, remBits(col("ph"), j)).otherwise(acc)
    }
    val sub = bands.join(hotDf, Seq("b", "bv"), "left_semi")
      .select(col("doc_id"), col("ph"), col("b"), col("bv"),
        posexplode(array(subBandCols(rem): _*)).as(Seq("sb", "sbv")))
    Some((bands.join(okDf, Seq("b", "bv"), "left_semi"), sub))
  }

  private[graft] def hammingNeighborsBounded(ph: DataFrame,
                                             bound: Long): DataFrame = {
    val hashes = ph.filter(col("ph").isNotNull)
    val bands = hashes.select(col("doc_id"), col("ph"),
      posexplode(array(bandCols(col("ph")): _*)).as(Seq("b", "bv")))
    splitByBucketBound(bands, bound) match {
      case None => bandPairs(bands, Seq("b", "bv")).distinct()
      case Some((ok, sub)) =>
        bandPairs(ok, Seq("b", "bv"))
          .union(bandPairs(sub, Seq("b", "bv", "sb", "sbv")))
          .distinct()
    }
  }

  /** Per-image near-dup DECISION, not all-pairs: every image with at
    * least one near-dup of smaller doc_id links to its MINIMUM such
    * neighbor. All-pairs output is quadratic in dup-cluster size — a
    * 130-image cluster alone is 8k pairs — which no 100 TB pipeline
    * materializes; the keep/drop decision list is linear in the corpus
    * and is what the downstream filter actually consumes (the same shape
    * as dedup_minhash_survivors). */
  private[graft] def starDups(neigh: DataFrame): DataFrame = {
    val m = neigh
      .groupBy(col("doc_id"))
      .agg(min(struct(col("dup_of"), col("hamming"))).as("m"))
    m.select(col("doc_id"), col("m.dup_of").as("dup_of"),
        col("m.hamming").as("hamming"))
      .orderBy(col("doc_id"))
  }

  private def phashDups(s: SparkSession, d: String): DataFrame =
    starDups(phashNeighbors(s, d))

  /** The aggregate evidence over the quadratic pair mass the decision
    * list elides: DISTINCT verified pairs counted by Hamming distance.
    * Bounded output (≤ PhHamMax+1 rows) regardless of corpus size. */
  private def hammingHist(neigh: DataFrame): DataFrame =
    neigh
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming"))

  private def phashHist(s: SparkSession, d: String): DataFrame =
    hammingHist(phashNeighbors(s, d))

  /** Hash + band + verified-neighbor CTE chain replaying the dHash
    * arithmetically from the pixel formula — the oracle never decodes a
    * PNG, so engine decoder and oracle stay independent (same discipline
    * as [[pixelStatsSql]]). */
  private val phashCtesSqlPrefix =
    s"""png AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 0),
       |dims AS (
       |  SELECT doc_id, 8 + n % 56 AS w, 8 + (n * 3) % 40 AS h, n % 251 AS s
       |  FROM png),
       |phc AS (
       |  SELECT d.doc_id, d.s, oy.range AS oy, ox.range AS ox,
       |    (ox.range * d.w) // $PhGrid AS sxa,
       |    ((ox.range + 1) * d.w) // $PhGrid AS sxb,
       |    (oy.range * d.h) // $PhGrid AS sy
       |  FROM dims d, range($PhGrid) oy, range(${PhGrid - 1}) ox),
       |phg AS (
       |  SELECT doc_id, oy, ox,
       |    (5*sxa + 3*sy + s) % 256 + (5*sxa + 3*sy + 37 + s) % 256
       |      + (5*sxa + 3*sy + 74 + s) % 256 AS ga,
       |    (5*sxb + 3*sy + s) % 256 + (5*sxb + 3*sy + 37 + s) % 256
       |      + (5*sxb + 3*sy + 74 + s) % 256 AS gb
       |  FROM phc),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN gb > ga
       |      THEN CAST(1 AS BIGINT) << CAST(oy * ${PhGrid - 1} + ox AS INT)
       |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
       |  FROM phg GROUP BY doc_id)""".stripMargin

  private val phashCtesSql =
    s"$phashCtesSqlPrefix,\n${bandNeighSql("ph")}"

  /** Band CTE over any hash CTE `src`(doc_id, ph). */
  private def bandsSql(src: String): String =
    s"""bands AS (
       |  SELECT doc_id, ph, j,
       |    (ph >> CAST($PhBandBits * j AS INT)) % ${1 << PhBandBits} AS bv
       |  FROM $src, unnest(${(0 until PhBands).mkString("[", ", ", "]")}) AS t(j))""".stripMargin

  /** Shared banded-join tail: bands + verified neighbors over any CTE
    * `src`(doc_id, ph). */
  private def bandNeighSql(src: String): String =
    s"""${bandsSql(src)},
       |neigh AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_of,
       |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.j = b.j AND a.bv = b.bv AND a.doc_id > b.doc_id
       |  WHERE bit_count(xor(a.ph, b.ph)) <= $PhHamMax)""".stripMargin

  private val starSelectSql =
    """d AS (SELECT doc_id, min(dup_of) AS dup_of FROM neigh GROUP BY doc_id)
      |SELECT d.doc_id, d.dup_of, n.hamming
      |FROM d JOIN neigh n ON n.doc_id = d.doc_id AND n.dup_of = d.dup_of
      |ORDER BY d.doc_id""".stripMargin

  private val histSelectSql =
    """SELECT hamming, count(*) AS n_pairs FROM neigh
      |GROUP BY hamming ORDER BY hamming""".stripMargin

  private val phashDupsSql =
    s"WITH $phashCtesSql,\n$starSelectSql"

  private val phashHistSql =
    s"WITH $phashCtesSql\n$histSelectSql"

  /** Incremental image near-dup — the crawl-cadence shape: a NEW batch
    * of images (every fifth image doc) screens against the standing
    * corpus (the rest). The asymmetry is the 100 TB story: the corpus
    * side shuffles only its 4 band rows per image and is never compared
    * all-pairs against itself; per new image the output is one decision
    * row (match count + closest distance), the admit/reject signal an
    * ingestion pipeline consumes. Same cached hash frame as the batch
    * queries. */
  /** Verified (doc_new, doc_corpus, hamming) rows from a new-vs-corpus
    * equi-join of one band frame on `keys`. */
  private def incrementalPairs(bands: DataFrame, isNew: Column,
                               keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    bands.filter(isNew).alias("a")
      .join(bands.filter(!isNew).alias("b"), cond)
      .select(col("a.doc_id").as("doc_new"), col("b.doc_id").as("doc_corpus"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("bigint")
          .as("hamming"))
      .filter(col("hamming") <= PhHamMax)
  }

  /** Shared by all three modalities: `isNewMod` selects every fifth
    * doc of the modality's doc_id stripe as the incoming batch. Rides
    * the SAME bucket-overflow defense as the batch join: a hot
    * (band, value) bucket with B corpus x b new rows is the identical
    * quadratic straggler, so oversized buckets (classified over the
    * combined frame) re-key by sub-bands before the new-vs-corpus
    * join. Exposed with an explicit bound for the spec. */
  private[graft] def bandedIncrementalBounded(hashes: DataFrame, isNewMod: Int,
                                              bound: Long): DataFrame = {
    val ph = hashes.filter(col("ph").isNotNull)
    val isNew = col("doc_id") % 15 === isNewMod
    val bands = ph.select(col("doc_id"), col("ph"),
      posexplode(array(bandCols(col("ph")): _*)).as(Seq("b", "bv")))
    val cand = splitByBucketBound(bands, bound) match {
      case None => incrementalPairs(bands, isNew, Seq("b", "bv"))
      case Some((ok, sub)) =>
        incrementalPairs(ok, isNew, Seq("b", "bv"))
          .union(incrementalPairs(sub, isNew, Seq("b", "bv", "sb", "sbv")))
    }
    cand.distinct()
      .groupBy(col("doc_new"))
      .agg(count(lit(1)).as("n_matches"), min(col("hamming")).as("best_hamming"))
      .orderBy(col("doc_new"))
  }

  private def bandedIncremental(s: SparkSession, hashes: DataFrame,
                                isNewMod: Int): DataFrame =
    bandedIncrementalBounded(hashes, isNewMod,
      s.conf.get(BucketBoundConf, DefaultBucketBound.toString).toLong)

  private def phashIncremental(s: SparkSession, d: String): DataFrame =
    bandedIncremental(s, phashes(s, d), 0) // image docs are % 3 == 0

  /** Incremental SQL tail over any hash CTE `src`(doc_id, ph). */
  private def incrementalSql(ctes: String, src: String, newMod: Int): String =
    s"""WITH $ctes,
       |${bandsSql(src)},
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_corpus,
       |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b ON a.j = b.j AND a.bv = b.bv
       |  WHERE a.doc_id % 15 = $newMod AND b.doc_id % 15 <> $newMod
       |    AND bit_count(xor(a.ph, b.ph)) <= $PhHamMax)
       |SELECT doc_new, count(*) AS n_matches, min(hamming) AS best_hamming
       |FROM cand GROUP BY doc_new ORDER BY doc_new""".stripMargin

  private def phashIncrementalSql = incrementalSql(phashCtesSqlPrefix, "ph", 0)

  // -------------------------------- perceptual audio near-dup (energy hash)

  /** Frames per clip: PhBits gradient comparisons need PhBits+1 energies. */
  private val AudioFrames = PhBits + 1

  /** 56-bit audio difference hash over REALLY DECODED PCM: the sample
    * stream splits into [[AudioFrames]] equal frames, each frame's energy
    * is the exact-integer sum of absolute amplitudes, and bit f is set
    * iff energy rises from frame f to f+1 — the sign-of-energy-difference
    * layout of audio fingerprinting (Haitsma & Kalker 2002, public
    * paper), integer-exact so the oracle replays it from payload bytes.
    * Uniform gain preserves every sign, so re-levelled copies of a clip
    * hash identically — the audio analogue of dHash's brightness
    * invariance (spec-pinned). Exposed for the spec. */
  private[graft] def audioHash56(samples: Array[Int]): Long = {
    val ns = samples.length
    var ph = 0L
    var prev = 0L
    var f = 0
    while (f < AudioFrames) {
      var e = 0L
      var i = f * ns / AudioFrames
      val end = (f + 1) * ns / AudioFrames
      while (i < end) { e += math.abs(samples(i)); i += 1 }
      if (f > 0 && e > prev) ph |= 1L << (f - 1)
      prev = e
      f += 1
    }
    ph
  }

  private def audioHashes(s: SparkSession, d: String): DataFrame =
    decodedHashes(s, d, "audio",
      (s2, d2) => assets(s2, d2)
        .filter(col("meta.mime") === "audio/wav")
        .select(col("doc_id"), col("blob")),
      hashKernel("audio"))

  private def audioDups(s: SparkSession, d: String): DataFrame =
    starDups(cachedNeighbors(s, d, "audio", audioHashes(s, d)))

  private def audioHist(s: SparkSession, d: String): DataFrame =
    hammingHist(cachedNeighbors(s, d, "audio", audioHashes(s, d)))

  /** Amplitude + frame-energy + hash CTEs replaying the PCM synthesis
    * arithmetically (the fixture corpus is pure ASCII, so DuckDB's char
    * codes ARE the payload bytes — the audio_levels discipline). */
  private val audioHashCtesPrefix =
    s"""wav AS (
       |  SELECT doc_id, text, octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 1),
       |amps AS (
       |  SELECT doc_id, n // 2 AS ns,
       |    list_transform(range(0, n // 2), i ->
       |      CASE WHEN unicode(substr(text, CAST(2*i+1 AS INT), 1)) +
       |                256 * unicode(substr(text, CAST(2*i+2 AS INT), 1)) >= 32768
       |           THEN abs(unicode(substr(text, CAST(2*i+1 AS INT), 1)) +
       |                256 * unicode(substr(text, CAST(2*i+2 AS INT), 1)) - 65536)
       |           ELSE unicode(substr(text, CAST(2*i+1 AS INT), 1)) +
       |                256 * unicode(substr(text, CAST(2*i+2 AS INT), 1)) END) AS a
       |  FROM wav),
       |frames AS (
       |  SELECT doc_id, f.range AS f,
       |    COALESCE(list_sum(a[
       |      CAST((f.range * ns) // $AudioFrames + 1 AS BIGINT) :
       |      CAST(((f.range + 1) * ns) // $AudioFrames AS BIGINT)]), 0) AS e
       |  FROM amps, range($AudioFrames) f),
       |aph AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN ne > e
       |      THEN CAST(1 AS BIGINT) << CAST(f AS INT)
       |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
       |  FROM (SELECT doc_id, f, e,
       |          lead(e) OVER (PARTITION BY doc_id ORDER BY f) AS ne
       |        FROM frames)
       |  WHERE f < ${AudioFrames - 1} GROUP BY doc_id)""".stripMargin

  private def audioHashCtesSql =
    s"$audioHashCtesPrefix,\n${bandNeighSql("aph")}"

  private val audioDupsSql =
    s"WITH $audioHashCtesSql,\n$starSelectSql"

  private val audioHistSql =
    s"WITH $audioHashCtesSql\n$histSelectSql"

  /** Incremental audio dedup — the crawl-cadence shape of
    * [[phashIncremental]] over the energy fingerprints (audio docs are
    * % 3 == 1; the % 15 == 1 slice is every fifth of them). */
  private def audioIncremental(s: SparkSession, d: String): DataFrame =
    bandedIncremental(s, audioHashes(s, d), 1)

  private def audioIncrementalSql = incrementalSql(audioHashCtesPrefix, "aph", 1)

  // ------------------------------- perceptual video near-dup (frame hashes)

  /** Frame geometry/count/seed for the full-pixel MP4 fixtures — same
    * discipline as [[pixelDims]]: small enough that the whole corpus
    * encodes+decodes in seconds, derived only from the payload length so
    * the oracle replays every pixel arithmetically. */
  def videoDims(n: Int): (Int, Int) = (8 + n % 48, 8 + (n * 5) % 32)
  def videoFrames(n: Int): Int = 4 + n % 5 // 4..8 — always >= 3 samples
  /** Per-frame pixel: the [[pixelValue]] formula with a frame-stepped
    * seed, so consecutive frames of one video are related-but-distinct
    * (a real clip's temporal coherence) while videos with congruent
    * payload lengths collide — the natural near-dup source. */
  def videoPixel(f: Int, x: Int, y: Int, c: Int, seed: Int): Int =
    pixelValue(x, y, c, seed + 19 * f)

  /** Ticks per frame keeping mvhd self-consistent: [[Mp4Timescale]] is
    * an exact multiple of [[Fps]] (600 / 24 = 25), so duration =
    * frames × 25 parses back to the exact frame count. */
  private val TicksPerFrame = Mp4Timescale / Fps

  /** COMPLETE movies (ftyp + moov(mvhd+trak/tkhd) + raw-RGB mdat) for
    * every video-mime doc. Partition-parallel, formula-replayable. */
  private def pixelMp4s(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val n = text.getBytes("UTF-8").length
        val (w, h) = videoDims(n)
        val nf = videoFrames(n)
        val seed = pixelSeed(n)
        (id, Mp4.encodeVideo(Mp4Timescale, nf * TicksPerFrame, w, h, nf,
          (f, x, y, c) => videoPixel(f, x, y, c, seed)))
      })
      .toDF("doc_id", "blob")
  }

  /** The three sampled frame indices of an nf-frame clip: first, middle,
    * last — the cheap temporal spread a crawl-scale video dedup samples
    * (hashing every frame is decode-bound for no recall gain at the
    * near-exact-copy distances banding covers). */
  private[graft] def sampleIdx(nf: Int): Seq[Int] =
    Seq(0, nf / 2, nf - 1)

  /** Per-bit majority of three 56-bit hashes — one hash per video, so
    * the SHARED banded join stays one-row-per-asset. A bit survives iff
    * >= 2 sampled frames agree, which keeps the video hash stable when
    * one sampled frame differs (re-encode glitch, title card). */
  private[graft] def majority3(a: Long, b: Long, c: Long): Long =
    (a & b) | (a & c) | (b & c)

  /** REAL decode: box-walk to tkhd dims and the mdat payload, slice the
    * three sampled frames out of the raw RGB plane, dHash each with the
    * SAME [[phash56]] kernel as images, majority-combine. */
  private[graft] def videoHash56(bytes: Array[Byte]): Option[Long] = for {
    (w, h) <- Mp4.parseTkhd(bytes)
    (from, to) <- Mp4.parseMdat(bytes)
    frameBytes = w * h * 3
    if frameBytes > 0 && (to - from) % frameBytes == 0
    nf = (to - from) / frameBytes
    if nf >= 3
    hs = sampleIdx(nf).map { f =>
      phash56(w, h, java.util.Arrays.copyOfRange(
        bytes, from + f * frameBytes, from + (f + 1) * frameBytes))
    }
  } yield majority3(hs(0), hs(1), hs(2))

  private def videoHashes(s: SparkSession, d: String): DataFrame =
    decodedHashes(s, d, "video", pixelMp4s, hashKernel("video"))

  private def videoDups(s: SparkSession, d: String): DataFrame =
    starDups(cachedNeighbors(s, d, "video", videoHashes(s, d)))

  private def videoHist(s: SparkSession, d: String): DataFrame =
    hammingHist(cachedNeighbors(s, d, "video", videoHashes(s, d)))

  /** Frame-hash + per-bit majority CTEs replaying [[videoHash56]]
    * arithmetically from the synthesis formulas — the oracle never
    * touches container bytes, so the engine's box walk, mdat slicing,
    * and majority fold are all under test. */
  private val videoHashCtesPrefix =
    s"""vid AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 2),
       |vdims AS (
       |  SELECT doc_id, 8 + n % 48 AS w, 8 + (n * 5) % 32 AS h,
       |    4 + n % 5 AS nf, n % 251 AS s
       |  FROM vid),
       |vfr AS (
       |  SELECT doc_id, w, h, s + 19 * f AS fs
       |  FROM vdims, unnest([0, nf // 2, nf - 1]) AS t(f)),
       |vphc AS (
       |  SELECT d.doc_id, d.fs, oy.range AS oy, ox.range AS ox,
       |    (ox.range * d.w) // $PhGrid AS sxa,
       |    ((ox.range + 1) * d.w) // $PhGrid AS sxb,
       |    (oy.range * d.h) // $PhGrid AS sy
       |  FROM vfr d, range($PhGrid) oy, range(${PhGrid - 1}) ox),
       |vphg AS (
       |  SELECT doc_id, oy, ox,
       |    CASE WHEN
       |      (5*sxb + 3*sy + fs) % 256 + (5*sxb + 3*sy + 37 + fs) % 256
       |        + (5*sxb + 3*sy + 74 + fs) % 256
       |      > (5*sxa + 3*sy + fs) % 256 + (5*sxa + 3*sy + 37 + fs) % 256
       |        + (5*sxa + 3*sy + 74 + fs) % 256
       |      THEN 1 ELSE 0 END AS risen
       |  FROM vphc),
       |vbits AS (
       |  SELECT doc_id, oy, ox, sum(risen) AS nr
       |  FROM vphg GROUP BY doc_id, oy, ox),
       |vph AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN nr >= 2
       |      THEN CAST(1 AS BIGINT) << CAST(oy * ${PhGrid - 1} + ox AS INT)
       |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
       |  FROM vbits GROUP BY doc_id)""".stripMargin

  private def videoHashCtesSql =
    s"$videoHashCtesPrefix,\n${bandNeighSql("vph")}"

  private val videoDupsSql =
    s"WITH $videoHashCtesSql,\n$starSelectSql"

  private val videoHistSql =
    s"WITH $videoHashCtesSql\n$histSelectSql"

  /** Incremental video dedup (video docs are % 3 == 2; the % 15 == 2
    * slice is every fifth of them). */
  private def videoIncremental(s: SparkSession, d: String): DataFrame =
    bandedIncremental(s, videoHashes(s, d), 2)

  private def videoIncrementalSql = incrementalSql(videoHashCtesPrefix, "vph", 2)

  // ------------------------------------------- near-dup cluster assignment

  /** Connected components over a modality's verified near-dup graph:
    * every asset gets cluster_id = min doc_id of its component
    * (singletons keep their own id) — the keep-one-per-cluster
    * assignment a dedup pipeline joins its retention decision against.
    * Reuses [[Dedup.connectedComponents]] (distributed hash-to-min
    * label propagation, O(diameter) rounds of join+agg — no
    * driver-side union-find) over the SAME cached neighbor pairs the
    * dups/hist queries read. */
  private def modalityClusters(s: SparkSession, d: String,
                               kind: String, hashes: DataFrame): DataFrame = {
    val labels = Dedup.cachedComponents(graft.SessionKeys(s), s"$d|$kind",
      cachedNeighbors(s, d, kind, hashes)
        .select(col("doc_id"), col("dup_of")))
      .withColumnRenamed("u", "doc_id")
    hashes.filter(col("ph").isNotNull).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  private def phashClusters(s: SparkSession, d: String): DataFrame =
    modalityClusters(s, d, "image", phashes(s, d))

  private def audioClusters(s: SparkSession, d: String): DataFrame =
    modalityClusters(s, d, "audio", audioHashes(s, d))

  private def videoClusters(s: SparkSession, d: String): DataFrame =
    modalityClusters(s, d, "video", videoHashes(s, d))

  /** Recursive-CTE transitive closure over `neigh`, base rows from the
    * hash CTE `src` — the oracle twin of [[modalityClusters]]. */
  private def clustersSelectSql(src: String) =
    s"""edges AS (
       |  SELECT doc_id AS u, dup_of AS v FROM neigh
       |  UNION SELECT dup_of, doc_id FROM neigh),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
       |SELECT p.doc_id,
       |  CAST(coalesce(least(p.doc_id, m.lbl), p.doc_id) AS BIGINT)
       |    AS cluster_id
       |FROM $src p
       |LEFT JOIN (SELECT u, min(v) AS lbl FROM reach GROUP BY u) m
       |  ON p.doc_id = m.u
       |ORDER BY p.doc_id""".stripMargin

  private val phashClustersSql =
    s"WITH RECURSIVE $phashCtesSql,\n${clustersSelectSql("ph")}"

  private def audioClustersSql =
    s"WITH RECURSIVE $audioHashCtesSql,\n${clustersSelectSql("aph")}"

  private val videoClustersSql =
    s"WITH RECURSIVE $videoHashCtesSql,\n${clustersSelectSql("vph")}"

  override def all: Seq[GraftQuery] = Seq(
    GraftQuery("mm_blob_meta", blobMeta, Some(blobMetaSql)),
    GraftQuery("mm_resize_pixels", resizePixels, Some(resizePixelsSql)),
    GraftQuery("mm_decode_stats", decodeStats, Some(decodeStatsSql)),
    GraftQuery("mm_audio_stats", audioStats, Some(audioStatsSql)),
    GraftQuery("mm_video_stats", videoStats, Some(videoStatsSql)),
    GraftQuery("mm_resize_plan", resizePlan, Some(resizePlanSql)),
    GraftQuery("mm_frame_sample", frameSample, Some(frameSampleSql)),
    GraftQuery("mm_pixel_stats", pixelStats, Some(pixelStatsSql)),
    GraftQuery("mm_audio_levels", audioLevels, Some(audioLevelsSql)),
    GraftQuery("dedup_phash_dups", phashDups, Some(phashDupsSql)),
    GraftQuery("dedup_phash_hist", phashHist, Some(phashHistSql)),
    GraftQuery("dedup_audio_dups", audioDups, Some(audioDupsSql)),
    GraftQuery("dedup_audio_hist", audioHist, Some(audioHistSql)),
    GraftQuery("dedup_phash_incremental", phashIncremental,
      Some(phashIncrementalSql)),
    GraftQuery("dedup_video_dups", videoDups, Some(videoDupsSql)),
    GraftQuery("dedup_video_hist", videoHist, Some(videoHistSql)),
    GraftQuery("dedup_audio_incremental", audioIncremental,
      Some(audioIncrementalSql)),
    GraftQuery("dedup_video_incremental", videoIncremental,
      Some(videoIncrementalSql)),
    GraftQuery("dedup_phash_clusters", phashClusters, Some(phashClustersSql)),
    GraftQuery("dedup_audio_clusters", audioClusters, Some(audioClustersSql)),
    GraftQuery("dedup_video_clusters", videoClusters, Some(videoClustersSql)),
  )
}
