package graft.extensions

/** Minimal, real WAV container handling: write and parse the canonical
  * 44-byte RIFF/WAVE header (RIFF spec + WAVE `fmt ` chunk — public
  * format, pure byte layout, no codec needed). PCM audio only, which is
  * exactly what a training-data audio pipeline stores pre-featurization.
  *
  * Mirrors [[Png]]: the audio/wav fixture blobs carry a VALID header and
  * the decode stage parses channels / sample rate / duration from the
  * container bytes instead of faking them.
  */
object Wav {

  /** RIFF(12) + fmt chunk(8+16) + data chunk header(8). */
  val HeaderLen: Int = 44

  /** 16-bit PCM throughout (format code 1). */
  val BitsPerSample: Int = 16

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** A valid 44-byte PCM WAV header for `dataLen` bytes of samples. */
  def header(channels: Int, sampleRate: Int, dataLen: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && dataLen >= 0)
    val blockAlign = channels * BitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    tag("RIFF") ++ le32(36 + dataLen) ++ tag("WAVE") ++
      tag("fmt ") ++ le32(16) ++
      le16(1 /*PCM*/) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(blockAlign) ++ le16(BitsPerSample) ++
      tag("data") ++ le32(dataLen)
  }

  /** Parsed header fields. `durationMs` floors, matching integer SQL. */
  final case class Fmt(channels: Int, sampleRate: Int, bitsPerSample: Int, dataLen: Int) {
    def byteRate: Int = sampleRate * channels * bitsPerSample / 8
    def durationMs: Long = if (byteRate == 0) 0L else dataLen.toLong * 1000L / byteRate
  }

  /** Parse the fmt + data chunk headers from a blob that must start with
    * a RIFF/WAVE signature. Walks chunks (a real reader can't assume
    * `fmt ` is first), so extra chunks before `data` still parse.
    * None = not a (well-formed, PCM) WAV. */
  def parseFmt(bytes: Array[Byte]): Option[Fmt] = walk(bytes, requirePayload = false).map(_._1)

  /** Like [[parseFmt]] but also returns the data chunk's PAYLOAD byte
    * offset — the entry point for actual sample decode. Unlike the
    * header parse, the declared payload must actually be present. */
  def parsePcm(bytes: Array[Byte]): Option[(Fmt, Int)] =
    walk(bytes, requirePayload = true)

  private def walk(bytes: Array[Byte], requirePayload: Boolean): Option[(Fmt, Int)] = {
    if (bytes.length < HeaderLen) return None
    if (!bytes.slice(0, 4).sameElements(tag("RIFF"))) return None
    if (!bytes.slice(8, 12).sameElements(tag("WAVE"))) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None
    while (off + 8 <= bytes.length) {
      val id = new String(bytes.slice(off, off + 4), "US-ASCII")
      val size = readLe32(bytes, off + 4)
      if (size < 0) return None
      id match {
        case "fmt " =>
          if (size < 16 || off + 8 + 16 > bytes.length) return None
          if (readLe16(bytes, off + 8) != 1) return None // PCM only
          fmt = Some((readLe16(bytes, off + 10), readLe32(bytes, off + 12),
            readLe16(bytes, off + 22)))
        case "data" =>
          // for sample decode the declared payload must actually be there
          if (requirePayload && off.toLong + 8L + size.toLong > bytes.length)
            return None
          return fmt.map { case (ch, sr, bits) => (Fmt(ch, sr, bits, size), off + 8) }
        case _ => // skip unknown chunk
      }
      // Long advance: a size near Int.MaxValue must not wrap `off` negative
      // and index the array out of bounds on the next iteration.
      val next = off.toLong + 8L + size.toLong + (size & 1)
      if (next > bytes.length) return None
      off = next.toInt // chunks are word-aligned
    }
    None
  }

  /** Decode the data chunk as 16-bit little-endian PCM: every COMPLETE
    * sample (an odd trailing byte is ignored), channels interleaved.
    * Real byte-level decode — the featurization entry point. */
  def decodeSamples(bytes: Array[Byte]): Option[Array[Int]] =
    parsePcm(bytes).map { case (fmt, off) =>
      val n = fmt.dataLen / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val u = (bytes(off + 2 * i) & 0xff) | ((bytes(off + 2 * i + 1) & 0xff) << 8)
        out(i) = if (u >= 32768) u - 65536 else u
        i += 1
      }
      out
    }
}
