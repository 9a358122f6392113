package graft.extensions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** JVM-native signature kernels for the dedup operators.
  *
  * These are the per-row hot loops of MinHash/SimHash: ~megabytes of md5
  * per document batch. As Catalyst higher-order-function expressions they
  * run interpreted per element (80+ s for 5000 docs); as a plain JVM loop
  * inside a typed `Dataset.map` they are ~20× faster and still perfectly
  * partition-parallel — the same trade spark.ml's MinHashLSH makes (its
  * hash functions are UDFs). Everything downstream of the signature
  * (banding, bucket equi-join, Jaccard verify) stays declarative.
  *
  * Determinism contract: every function here must produce byte-identical
  * results to the DuckDB oracle SQL in [[Dedup]]:
  *  - md5 of UTF-8 bytes, lowercase hex
  *  - word shingles = indices 0..max(n-3,0) of a split that KEEPS trailing
  *    empty tokens (Spark/DuckDB string_split semantics), window of 3,
  *    truncated at the end, distinct
  *  - minhash_k = lexicographic min over md5("k|" + shingle)
  *  - simhash bit b = majority over shingles of bit (b%4) of hex nibble
  *    (b/4) of md5(shingle)
  */
object Signatures {

  def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Distinct word 3-shingles; mirrors `sequence(0, greatest(size-3, 0))`
    * + `slice(toks, i+1, 3)` exactly (incl. <3-token degenerate case). */
  def wordShingles(text: String): Seq[String] = {
    val toks = text.split(" ", -1)
    val last = math.max(toks.length - 3, 0)
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i <= last) {
      out += toks.slice(i, i + 3).mkString(" ")
      i += 1
    }
    out.toSeq
  }

  /** Distinct character n-grams; mirrors `sequence(0, greatest(len-n, 0))`
    * + `substr(text, i+1, n)`. */
  def charNgrams(text: String, n: Int): Seq[String] = {
    val last = math.max(text.length - n, 0)
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i <= last) {
      out += text.substring(i, math.min(i + n, text.length))
      i += 1
    }
    out.toSeq
  }

  /** K seeded min-hashes (lexicographic min of lowercase hex). */
  def minhash(shingles: Seq[String], k: Int): Seq[String] =
    (0 until k).map { j =>
      val prefix = j.toString + "|"
      var min: String = null
      shingles.foreach { s =>
        val h = md5hex(prefix + s)
        if (min == null || h < min) min = h
      }
      min
    }

  /** Band keys: md5 of each band's concatenated signature rows
    * (sig length must be divisible by `rows`). Fewer, wider bands =
    * stricter candidate generation. */
  def bandKeys(sig: Seq[String], rows: Int = 2): Seq[String] =
    sig.grouped(rows).map(g => md5hex(g.mkString)).toSeq

  /** Position-weighted rolling document fingerprint:
    * sum over tokens of hash32(token) * (1-based position), mod 1e9+7.
    * Order-sensitive (unlike a bag-of-words hash) and replayable in SQL:
    * terms < 2^39, full sum < 2^46, so sum-then-mod in BIGINT matches the
    * iterative mod here. */
  def rollingFingerprint(text: String): Long = {
    val toks = text.split(" ", -1)
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      val v = java.lang.Long.parseLong(md5hex(toks(i)).substring(0, 8), 16)
      sum = (sum + v * (i + 1)) % 1000000007L
      i += 1
    }
    sum
  }

  /** 32-bit SimHash. Bit b reads nibble b/4 (counting from the MOST
    * significant hex char of the digest) at in-nibble bit b%4 —
    * identical layout to the per-char strpos arithmetic in the oracle. */
  def simhash32(shingles: Seq[String]): Long = {
    val votes = new Array[Int](32)
    shingles.foreach { s =>
      val hex = md5hex(s)
      var b = 0
      while (b < 32) {
        val nibble = Character.digit(hex.charAt(b / 4), 16)
        if (((nibble >> (b % 4)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
