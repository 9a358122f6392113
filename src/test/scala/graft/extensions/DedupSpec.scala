package graft.extensions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Dedup signature semantics on hand-built documents. */
class DedupSpec extends SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (2L, "completely different content about spark engines and lakes"),
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("word shingles are 3-grams, distinct, aligned with DuckDB range()") {
    import spark.implicits._
    val sh = docs.filter(col("doc_id") === 0)
      .select(Dedup.wordShingles(col("text")).as("sh"))
      .as[Seq[String]].head()
    assert(sh.head === "the quick brown")
    assert(sh.contains("over the lazy"))
    assert(sh.length === 7) // 9 tokens -> 7 shingles, all distinct here
  }

  test("minhash signature is deterministic and order-insensitive") {
    import spark.implicits._
    val sig = docs.select(
      Dedup.minhashSignature(Dedup.wordShingles(col("text"))).as("sig"),
      col("doc_id"))
    val s0 = sig.filter(col("doc_id") === 0).as[(Seq[String], Long)].head()._1
    val s3 = sig.filter(col("doc_id") === 3).as[(Seq[String], Long)].head()._1
    assert(s0 === s3)      // identical text -> identical signature
    assert(s0.length === 8)
    assert(s0.forall(_.matches("[0-9a-f]{32}")))
  }

  test("simhash: identical docs collide, near-dups are close, others far") {
    import spark.implicits._
    val sh = docs.select(col("doc_id"),
      Dedup.simhash(Dedup.wordShingles(col("text"))).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) === sh(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 32)))
  }
}
