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

  // One digest per thread: MessageDigest.getInstance on every call was a
  // measurable share of the signature kernels' runtime.
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def md5hex(s: String): String = {
    val d = mdLocal.get().digest(s.getBytes(StandardCharsets.UTF_8))
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

  /** First 4 digest bytes of md5(s) as an unsigned 32-bit value — equal to
    * DuckDB's `('0x' || substr(md5(s), 1, 8))::BIGINT` without building the
    * 32-char hex string. */
  def md5w32(s: String): Long = {
    val d = mdLocal.get().digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Affine minhash family over md5w32 values: h_j(x) = (A_j·x + B_j) mod P.
    * P prime > 2^32; A_j < 2^28 keeps A_j·x < 2^60 — no 64-bit overflow in
    * either engine (DuckDB BIGINT errors on overflow rather than wrapping,
    * so the bound is a correctness constraint for the oracle, not a nicety).
    * One md5 per shingle instead of K — this is what took dedup_ngram_pairs
    * from 72 s to single digits at sf0.1. */
  val MinhashP = 4294967311L
  private val MaxK = 64

  /** splitmix64 finalizer — a fixed, RNG-free constant stream, so the
    * oracle SQL (which embeds the first K values verbatim) replays. */
  private def mix(j: Long): Long = {
    var z = j * 0x9e3779b97f4a7c15L + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val MinhashA: Array[Long] =
    Array.tabulate(MaxK)(j => (mix(j) & ((1L << 28) - 1)) | 1L)
  val MinhashB: Array[Long] =
    Array.tabulate(MaxK)(j => (mix(j + 1000) & Long.MaxValue) % MinhashP)

  /** K numeric min-hashes: min over shingles of (A_j·md5w32(s) + B_j) mod P. */
  def minhash(shingles: Seq[String], k: Int): Seq[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    shingles.foreach { s =>
      val h = md5w32(s)
      var j = 0
      while (j < k) {
        val v = (MinhashA(j) * h + MinhashB(j)) % MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    mins.toSeq
  }

  /** Polynomial string hash matching DuckDB
    * `list_reduce(list_transform(range(1, len(s)+1), j -> unicode(substr(s, j, 1))),
    *              (a, b) -> (a*131 + b) % P)`:
    * init = first char code, then fold (h*131 + c) mod P. h < 2^32 and
    * 131·h + c < 2^40 — no overflow in either engine. */
  val PolyB = 131L
  def polyHash(s: String): Long = {
    var h = 0L
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j).toLong
      h = if (j == 0) c else (h * PolyB + c) % MinhashP
      j += 1
    }
    h
  }

  /** [[polyHash]] of every n-char window of `s` in ONE pass — entry i
    * equals `polyHash(s.substring(i, min(i+n, len)))`, and a string
    * shorter than n yields its single whole-string hash (the
    * `greatest(len-n+1, 1)` window-count convention the char-ngram SQL
    * mirrors). The kernel exists because the declarative formulation —
    * transform(sequence(...), i -> poly_hash(substring(...))) — runs on
    * the interpreted higher-order-function path and allocates a
    * substring per position; this is one scan of the char array. */
  def polyNgramHashes(s: String, n: Int): Array[Long] = {
    val len = s.length
    val count = math.max(len - n + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0L
      val end = math.min(i + n, len)
      var k = i
      while (k < end) {
        val c = s.charAt(k).toLong
        h = if (k == i) c else (h * PolyB + c) % MinhashP
        k += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** [[polyHash]] of every k-TOKEN window of `s` (tokens = split on a
    * single space, trailing empties kept — `split(text, " ")`
    * semantics), windows joined with one space before hashing: entry i
    * equals `polyHash(tokens.slice(i, i+k).mkString(" "))`. Fewer than
    * k tokens yield the single whole-string window (the
    * `greatest(n-k+1, 1)` convention of the word-bigram SQL). One pass,
    * no window-string allocation — the declarative
    * transform(sequence, i -> hash(concat_ws(slice(...)))) form runs
    * per-element on the interpreted higher-order path. */
  def tokenWindowHashes(s: String, k: Int): Array[Long] = {
    val toks = s.split(" ", -1)
    val n = toks.length
    val count = math.max(n - k + 1, 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0L
      var seen = false
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) {
          if (!seen) { h = ' '.toLong; seen = true }
          else h = (h * PolyB + ' '.toLong) % MinhashP
        }
        val t = toks(j)
        var c = 0
        while (c < t.length) {
          val ch = t.charAt(c).toLong
          if (!seen) { h = ch; seen = true }
          else h = (h * PolyB + ch) % MinhashP
          c += 1
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Sorted-distinct copy of a raw hash array (mutates the input order). */
  def distinctSorted(hs: Array[Long]): Seq[Long] = {
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    hs.take(w).toSeq
  }

  /** Distinct hash set of word shingles (md5w32 each) — the verify-stage
    * set representation: Jaccard over hashed shingles instead of strings.
    * Deterministic cross-engine (the oracle applies the same hash), and
    * the int64 set join is far cheaper than string-array intersection. */
  def hashedSet(shingles: Seq[String]): Seq[Long] =
    distinctSorted(shingles.map(md5w32).toArray)

  /** Char-ngram signature — (distinct window-hash set, K minhashes) —
    * without materializing shingle strings OR md5: each window's
    * polynomial hash feeds the affine family directly, per text position.
    * Min over the position MULTISET equals min over the distinct set (min
    * is idempotent), so this matches an oracle that hashes the
    * `list_distinct` shingle list. Constant work per input byte and no
    * per-window allocation — the only kernel shape that survives
    * char-level dedup at 100 TB. */
  def charNgramSig(text: String, n: Int, k: Int): (Seq[Long], Seq[Long]) = {
    val len = text.length
    val m = if (len <= n) 1 else len - n + 1
    val hs = new Array[Long](m)
    if (len <= n) hs(0) = polyHash(text)
    else {
      var i = 0
      while (i + n <= len) {
        var h = 0L
        var j = i
        while (j < i + n) {
          val c = text.charAt(j).toLong
          h = if (j == i) c else (h * PolyB + c) % MinhashP
          j += 1
        }
        hs(i) = h
        i += 1
      }
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var x = 0
    while (x < m) {
      val h = hs(x)
      var j = 0
      while (j < k) {
        val v = (MinhashA(j) * h + MinhashB(j)) % MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      x += 1
    }
    (distinctSorted(hs), mins.toSeq)
  }

  /** Band keys: each band's signature rows joined with '|' (bucket-join
    * equality key — no extra hashing needed; sig length must be divisible
    * by `rows`). Fewer, wider bands = stricter candidate generation. */
  def bandKeys(sig: Seq[Long], rows: Int = 2): Seq[String] =
    sig.grouped(rows).map(_.mkString("|")).toSeq

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
      val v = md5w32(toks(i))
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
