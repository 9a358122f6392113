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
}
