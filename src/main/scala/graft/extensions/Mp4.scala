package graft.extensions

/** Minimal, real MP4 (ISO BMFF) container handling: write and parse
  * `ftyp` + `moov`/`mvhd` boxes (ISO/IEC 14496-12 §4.3/§8.2.2 — public
  * format, pure byte layout, no codec needed). The movie header carries
  * the timescale and duration every video pipeline needs for frame
  * sampling; sample tables (stts/stsz) are out of scope.
  *
  * Mirrors [[Png]]/[[Wav]]: the video/mp4 fixture blobs carry a VALID
  * ftyp+mvhd prefix and the decode stage box-walks to the real values.
  */
object Mp4 {

  /** ftyp(20) + moov(8) + mvhd(108, version 0). */
  val HeaderLen: Int = 136

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe64(b: Array[Byte], off: Int): Long =
    (readBe32(b, off).toLong << 32) | (readBe32(b, off + 4).toLong & 0xffffffffL)

  private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Identity transform matrix per §8.2.2.2 (fixed-point 16.16 / 2.30). */
  private val IdentityMatrix: Array[Byte] =
    be32(0x00010000) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000)

  /** A valid ftyp + moov(mvhd v0) prefix for a movie of `duration`
    * ticks at `timescale` ticks/second. */
  def header(timescale: Int, duration: Int): Array[Byte] = {
    require(timescale > 0 && duration >= 0)
    val ftyp = be32(20) ++ tag("ftyp") ++ tag("isom") ++ be32(0x200) ++ tag("isom")
    val mvhdData =
      be32(0) ++ // version 0 + flags
        be32(0) ++ be32(0) ++ // creation/modification time (epoch 1904; fixed 0)
        be32(timescale) ++ be32(duration) ++
        be32(0x00010000) /*rate 1.0*/ ++
        Array[Byte](0x01, 0x00) /*volume 1.0*/ ++ Array.fill[Byte](10)(0) /*reserved*/ ++
        IdentityMatrix ++
        Array.fill[Byte](24)(0) /*pre_defined*/ ++
        be32(2) /*next_track_ID*/
    val mvhd = be32(8 + mvhdData.length) ++ tag("mvhd") ++ mvhdData
    val moov = be32(8 + mvhd.length) ++ tag("moov") ++ mvhd
    ftyp ++ moov
  }

  /** Parsed movie header. `durationMs` floors, matching integer SQL. */
  final case class Mvhd(timescale: Long, duration: Long) {
    def durationMs: Long = if (timescale == 0) 0L else duration * 1000L / timescale
  }

  /** Box-walk the top level for `moov`, then inside it for `mvhd`
    * (version 0 or 1), and read (timescale, duration). A real reader
    * can't assume moov is first — trailing/mdat-style siblings are
    * skipped. None = not a (well-formed) MP4 prefix. */
  def parseMvhd(bytes: Array[Byte]): Option[Mvhd] = {
    // require a leading ftyp so arbitrary payloads aren't misread
    if (bytes.length < 16 || readBe32(bytes, 0) < 16) return None
    if (!bytes.slice(4, 8).sameElements(tag("ftyp"))) return None
    findBox(bytes, 0, bytes.length, "moov").flatMap { case (mOff, mEnd) =>
      findBox(bytes, mOff, mEnd, "mvhd").flatMap { case (off, end) =>
        if (off + 4 > end) None
        else (bytes(off) & 0xff) match {
          case 0 if off + 4 + 16 <= end =>
            Some(Mvhd(readBe32(bytes, off + 12).toLong & 0xffffffffL,
              readBe32(bytes, off + 16).toLong & 0xffffffffL))
          case 1 if off + 4 + 28 <= end =>
            Some(Mvhd(readBe32(bytes, off + 20).toLong & 0xffffffffL,
              readBe64(bytes, off + 24)))
          case _ => None
        }
      }
    }
  }

  // ------------------------------------------------- full video fixture

  /** A COMPLETE tiny movie: ftyp + moov(mvhd + trak(tkhd)) + mdat of
    * raw frame-major RGB24 — the video analogue of [[Png.encodeRgb]]'s
    * full-pixel fixtures. tkhd (§8.3.3) is the real home of the visual
    * dimensions (mvhd carries none — true to the format); the mdat
    * payload is what a decoded-sample plane buffer looks like after the
    * codec stage, which keeps the fixture codec-free while the
    * container walk, the fixed-point 16.16 dims, and the frame math
    * stay REAL. `duration` ticks at `timescale` must equal `frames` at
    * the pipeline's nominal fps for the header to be self-consistent —
    * the caller owns that arithmetic. */
  def encodeVideo(timescale: Int, duration: Int, w: Int, h: Int,
                  frames: Int, px: (Int, Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0)
    // 16.16 fixed point holds 15 unsigned integer bits: w << 16 at
    // w >= 0x8000 sets the sign bit / wraps, silently encoding garbage
    // dims parseTkhd would faithfully read back; and the mdat size
    // arithmetic must not overflow Int into a negative array length
    require(w < 0x8000 && h < 0x8000,
      s"tkhd 16.16 dims overflow: w=$w h=$h (max 32767)")
    // headroom for the mdat box header AND the ftyp+moov prefix of the
    // final concatenated array — a payload of exactly Int.MaxValue
    // would wrap `be32(8 + data.length)` negative and overflow the
    // total file length, the very failure the guard exists to exclude
    require(frames.toLong * w * h * 3 <= Int.MaxValue - 1024,
      s"mdat payload too large for one Int-addressed file: frames=$frames w=$w h=$h")
    val ftyp = be32(20) ++ tag("ftyp") ++ tag("isom") ++ be32(0x200) ++ tag("isom")
    val mvhdData =
      be32(0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(duration) ++
        be32(0x00010000) ++
        Array[Byte](0x01, 0x00) ++ Array.fill[Byte](10)(0) ++
        IdentityMatrix ++
        Array.fill[Byte](24)(0) ++
        be32(2)
    val mvhd = be32(8 + mvhdData.length) ++ tag("mvhd") ++ mvhdData
    val tkhdData = // version 0, flags 0x7 (enabled|in_movie|in_preview)
      be32(0x000007) ++
        be32(0) ++ be32(0) ++ // creation/modification
        be32(1) ++ be32(0) ++ // track_ID, reserved
        be32(duration) ++
        Array.fill[Byte](8)(0) ++ // reserved
        Array.fill[Byte](2)(0) ++ Array.fill[Byte](2)(0) ++ // layer, group
        Array.fill[Byte](2)(0) ++ Array.fill[Byte](2)(0) ++ // volume, reserved
        IdentityMatrix ++
        be32(w << 16) ++ be32(h << 16) // 16.16 fixed point
    val tkhd = be32(8 + tkhdData.length) ++ tag("tkhd") ++ tkhdData
    val trak = be32(8 + tkhd.length) ++ tag("trak") ++ tkhd
    val moov = be32(8 + mvhd.length + trak.length) ++ tag("moov") ++ mvhd ++ trak
    val data = new Array[Byte](frames * w * h * 3)
    var i = 0
    var f = 0
    while (f < frames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          data(i) = px(f, x, y, 0).toByte
          data(i + 1) = px(f, x, y, 1).toByte
          data(i + 2) = px(f, x, y, 2).toByte
          i += 3; x += 1
        }
        y += 1
      }
      f += 1
    }
    val mdat = be32(8 + data.length) ++ tag("mdat") ++ data
    ftyp ++ moov ++ mdat
  }

  /** Box-walk moov → trak → tkhd and read the 16.16 visual dims. */
  def parseTkhd(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 16 || readBe32(bytes, 0) < 16) return None
    if (!bytes.slice(4, 8).sameElements(tag("ftyp"))) return None
    findBox(bytes, 0, bytes.length, "moov").flatMap { case (mOff, mEnd) =>
      findBox(bytes, mOff, mEnd, "trak").flatMap { case (tOff, tEnd) =>
        findBox(bytes, tOff, tEnd, "tkhd").flatMap { case (off, end) =>
          if (off + 4 > end) None
          else (bytes(off) & 0xff) match {
            case 0 if off + 84 <= end =>
              Some((readBe32(bytes, off + 76) >>> 16,
                readBe32(bytes, off + 80) >>> 16))
            case 1 if off + 96 <= end =>
              Some((readBe32(bytes, off + 88) >>> 16,
                readBe32(bytes, off + 92) >>> 16))
            case _ => None
          }
        }
      }
    }
  }

  /** Top-level mdat payload span (offset until end of box). */
  def parseMdat(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 16 || readBe32(bytes, 0) < 16) return None
    if (!bytes.slice(4, 8).sameElements(tag("ftyp"))) return None
    findBox(bytes, 0, bytes.length, "mdat")
  }

  /** Scan sibling boxes in [from, to); return the payload span of the
    * first box of the wanted type. */
  private def findBox(b: Array[Byte], from: Int, to: Int, want: String): Option[(Int, Int)] = {
    var off = from
    val w = tag(want)
    while (off + 8 <= to) {
      val size = readBe32(b, off)
      // Long bounds check: a size near Int.MaxValue must not wrap negative
      // and sneak past the window test.
      if (size < 8 || off.toLong + size > to) return None // size64/malformed: reject
      if (b.slice(off + 4, off + 8).sameElements(w)) return Some((off + 8, off + size))
      off += size
    }
    None
  }
}
