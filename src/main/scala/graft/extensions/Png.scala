package graft.extensions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal, real PNG handling: write and parse the 8-byte signature +
  * IHDR chunk, and — for complete image blobs — a full 8-bit RGB
  * encode/decode (PNG spec §5/§9/§11 — public format, pure byte layout;
  * zlib via the JDK's Deflater/Inflater, no external codec).
  *
  * Used by [[Multimodal]]: the lightweight asset fixtures carry a VALID
  * header (dims read back out of container bytes, CRC verified); the
  * pixel-stats fixtures are COMPLETE PNGs — IHDR + Deflater-compressed
  * IDAT of filtered scanlines (all five standard filter types) + IEND —
  * and [[decodeRgb]] is a real decoder: chunk walk with CRC checks,
  * Inflater, per-scanline unfilter. Cross-validated against the JDK's
  * independent ImageIO PNG reader in MultimodalSpec.
  */
object Png {

  /** \x89 P N G \r \n \x1a \n */
  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Signature(8) + IHDR length(4) + type(4) + data(13) + CRC(4). */
  val HeaderLen: Int = 33

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** A valid 33-byte PNG header for an 8-bit RGB image of w x h. */
  def header(width: Int, height: Int): Array[Byte] = {
    val data = be32(width) ++ be32(height) ++
      Array[Byte](8 /*bit depth*/, 2 /*truecolor*/, 0, 0, 0)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new CRC32
    crc.update(typeAndData)
    Signature ++ be32(data.length) ++ typeAndData ++ be32(crc.getValue.toInt)
  }

  /** Parse (width, height) from a blob that must start with a valid PNG
    * signature + IHDR chunk; CRC-checked. None = not a (well-formed) PNG. */
  def parseIhdr(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < HeaderLen) return None
    if (!bytes.take(8).sameElements(Signature)) return None
    val len = readBe32(bytes, 8)
    if (len != 13) return None
    if (!(bytes.slice(12, 16) sameElements "IHDR".getBytes("US-ASCII"))) return None
    val crc = new CRC32
    crc.update(bytes.slice(12, 16 + len))
    if (crc.getValue.toInt != readBe32(bytes, 16 + len)) return None
    Some((readBe32(bytes, 16), readBe32(bytes, 20)))
  }

  // ------------------------------------------------- full encode / decode

  /** Bytes per pixel for the only pixel format handled: 8-bit truecolor. */
  private val Bpp = 3

  /** One complete chunk: length + type + data + CRC32(type ++ data). */
  private def chunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val typeAndData = chunkType.getBytes("US-ASCII") ++ data
    val crc = new CRC32
    crc.update(typeAndData)
    be32(data.length) ++ typeAndData ++ be32(crc.getValue.toInt)
  }

  /** Paeth predictor (PNG spec §9.4) — shared by encoder and decoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** The filter-type predictor for byte position `b` of a scanline:
    * left = raw[b - 3], up = prior[b], upLeft = prior[b - 3] (0 outside). */
  private def predictor(ft: Int, left: Int, up: Int, upLeft: Int): Int =
    ft match {
      case 0 => 0
      case 1 => left
      case 2 => up
      case 3 => (left + up) / 2
      case 4 => paeth(left, up, upLeft)
      case other => throw new IllegalArgumentException(s"filter type $other")
    }

  /** Encode a COMPLETE 8-bit RGB PNG: signature, IHDR, one IDAT holding
    * the Deflater-compressed filtered scanlines, IEND. Scanline y uses
    * filter type y % 5, so all five standard filters are exercised (and
    * must be reversed correctly by any decoder). `pixel(x, y, c)` returns
    * the channel value 0-255 (c = 0/1/2 → R/G/B). */
  def encodeRgb(width: Int, height: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = width * Bpp
    val filtered = new Array[Byte](height * (1 + stride))
    val raw = new Array[Byte](height * stride) // unfiltered, for predictors
    var y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (1 + stride)) = ft.toByte
      var b = 0
      while (b < stride) {
        val v = pixel(b / Bpp, y, b % Bpp)
        raw(y * stride + b) = v.toByte
        val left = if (b >= Bpp) raw(y * stride + b - Bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + b) & 0xff else 0
        val upLeft = if (y > 0 && b >= Bpp) raw((y - 1) * stride + b - Bpp) & 0xff else 0
        filtered(y * (1 + stride) + 1 + b) = (v - predictor(ft, left, up, upLeft)).toByte
        b += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    header(width, height) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** A fully decoded 8-bit RGB image: row-major, 3 bytes per pixel. */
  final case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  /** REAL decode of a complete 8-bit truecolor PNG: chunk walk with CRC
    * verification, IDAT concatenation, zlib inflate via the JDK
    * [[Inflater]], and per-scanline unfiltering of all five standard
    * filter types. None = not a well-formed PNG of that pixel format.
    * Cross-validated against ImageIO's independent decoder in
    * MultimodalSpec, so an encoder bug can't hide behind a matching
    * decoder bug. */
  def decodeRgb(bytes: Array[Byte]): Option[Decoded] = {
    val dims = parseIhdr(bytes) // signature + IHDR + its CRC
    if (dims.isEmpty) return None
    val (w, h) = dims.get
    // dims are attacker-controlled container bytes: reject anything whose
    // buffer arithmetic could overflow Int BEFORE allocating (a negative
    // array size must surface as None, not an exception)
    if (w <= 0 || h <= 0 ||
      h.toLong * (1L + w.toLong * Bpp) > Int.MaxValue) return None
    // bitDepth 8, colorType 2 (truecolor), no interlace — the only
    // layout this decoder speaks
    if (bytes(24) != 8 || bytes(25) != 2 || bytes(28) != 0) return None
    // chunk walk: CRC-check everything, concatenate IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var off = HeaderLen
    var sawEnd = false
    while (!sawEnd) {
      if (off + 12 > bytes.length) return None
      val len = readBe32(bytes, off)
      // compare in Long: a length field near Int.MaxValue would wrap the
      // Int sum negative and sneak past the bound (then crash crc.update)
      if (len < 0 || off.toLong + 12L + len > bytes.length) return None
      val chunkType = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue.toInt != readBe32(bytes, off + 8 + len)) return None
      chunkType match {
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks: CRC-checked, content ignored
      }
      off += 12 + len
    }
    val stride = w * Bpp
    val filtered = new Array[Byte](h * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val complete =
      try {
        var got = 0
        var truncated = false
        while (got < filtered.length && !inflater.finished() && !truncated) {
          val n = inflater.inflate(filtered, got, filtered.length - got)
          // any zero-progress iteration that isn't end-of-stream is a
          // malformed payload (truncated input, or a zlib header asking
          // for a preset dictionary we'll never supply) — bail rather
          // than spin forever
          if (n == 0 && !inflater.finished()) truncated = true
          got += n
        }
        !truncated && got == filtered.length && {
          // the stream must END here: trailing pixel data would mean the
          // IHDR dims lie about the payload
          val probe = new Array[Byte](1)
          inflater.finished() || inflater.inflate(probe) == 0
        }
      } catch {
        // a malformed-but-CRC-valid deflate stream is still "not a PNG",
        // not a crash
        case _: java.util.zip.DataFormatException => false
      } finally inflater.end()
    if (!complete) return None
    // unfilter in place into the raw pixel array
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      var b = 0
      while (b < stride) {
        val left = if (b >= Bpp) raw(y * stride + b - Bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + b) & 0xff else 0
        val upLeft = if (y > 0 && b >= Bpp) raw((y - 1) * stride + b - Bpp) & 0xff else 0
        raw(y * stride + b) =
          ((filtered(y * (1 + stride) + 1 + b) & 0xff) +
            predictor(ft, left, up, upLeft)).toByte
        b += 1
      }
      y += 1
    }
    Some(Decoded(w, h, raw))
  }
}
