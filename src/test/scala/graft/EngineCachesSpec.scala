package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Full-pass-context hardening for the cache-backed operators: the
  * driver measures every query inside a ~200-query pass whose memory/
  * cache churn evicts the per-(session, dir) persisted frames the
  * extension modules keep (`Bench --full-context` reproduces that
  * state for TIMING adjudication; this spec pins CORRECTNESS under
  * it). For each cache-sensitive query: the result after
  * [[EngineCaches.invalidateAll]] + storage-memory churn + foreign
  * query traffic must be IDENTICAL to the fresh result — cache loss
  * may cost time, never rows. Timing itself is deliberately not
  * asserted here: this VM's 3-8x CPU-steal variance would make any
  * time bound a flake generator (Bench's calibration machinery owns
  * that signal). */
class EngineCachesSpec extends SparkTestBase {

  /** The queries whose plans consult a module-level persisted cache:
    * signature sets (dedup), scaled vectors + centroids (similarity/
    * coreset), PQ codebooks, span islands, and the lake-served ANN
    * whose manifest reads cold-start after eviction. */
  private val cacheSensitive = Seq(
    "dedup_semantic", "sim_lake_knn", "sim_coreset_prototypes",
    "dedup_dup_spans", "dedup_minhash_pairs", "sim_knn_ivfpq",
    "text_langid_profile",
    // the bigram pair frames (corpus frequency + LM counts join back
    // over them; r20's window-to-join rewrites)
    "text_bigram_freq", "text_lm_perplexity")

  /** Cheap foreign traffic: what a full pass runs between a cache
    * fill and the measured query. */
  private val churnQueries = Seq(
    "q01_pricing_summary", "q03_count_star", "q10_join_agg",
    "text_token_count", "cdc_op_counts")

  private def rowsOf(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq

  test("cache-sensitive queries return identical rows after cache eviction + memory churn + foreign traffic") {
    val fresh = cacheSensitive.map(n => n -> rowsOf(n)).toMap
    // evict every module cache, then churn executor storage the way a
    // long pass does: a persisted frame large enough to pressure the
    // small test block manager, materialized and dropped
    EngineCaches.invalidateAll()
    val churn = spark.range(2000000L)
      .select(col("id"), sha2(col("id").cast("string"), 256).as("pad"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      assert(churn.count() === 2000000L)
      churnQueries.foreach(n =>
        SparkEntry.queries(n)(spark, sf0001).collect())
      cacheSensitive.foreach { n =>
        assert(rowsOf(n) === fresh(n), s"$n diverged after cache eviction")
      }
    } finally churn.unpersist(blocking = true)
  }

  test("invalidateAll quiesces: concurrent invalidates never corrupt an in-flight query") {
    // Uncaching an InMemoryRelation WHILE the AQE stage materializing it
    // runs can silently EMPTY that query's result (reproduced: raw
    // module invalidates landing 125-175 ms into a warm pair-cache query
    // returned Success(0 rows), no exception — the worst failure class
    // this engine has). EngineCaches.invalidateAll therefore waits for
    // the context's active jobs to drain + settle before touching any
    // cache. Sweep invalidates across launch offsets that bracket the
    // reproduced anomaly window and require EXACT rows every time.
    val fresh = rowsOf("text_bigram_freq")
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      for (off <- Seq(0L, 75L, 125L, 150L, 175L, 250L)) {
        EngineCaches.invalidateAll()
        val raced = scala.concurrent.Future { rowsOf("text_bigram_freq") }
        Thread.sleep(off)
        EngineCaches.invalidateAll()
        val got = scala.concurrent.Await.result(
          raced, scala.concurrent.duration.Duration(600, "s"))
        assert(got === fresh, s"raced pair-cache query diverged at offset $off ms")
      }
    } finally {
      // a failed offset must leak neither the thread nor the raced
      // runs' persisted caches into the storage-sensitive tests after
      pool.shutdown()
      EngineCaches.invalidateAll()
    }
  }

  test("invalidateAll is idempotent and caches re-derive after clearing") {
    EngineCaches.invalidateAll()
    EngineCaches.invalidateAll() // double-clear must not throw
    // a cache-backed read works immediately after a clear (re-derives)
    val v = extensions.Similarity.scaledVecCached(spark, sf0001)
    assert(v.count() > 0)
    EngineCaches.invalidateAll()
    assert(extensions.Similarity.scaledVecCached(spark, sf0001).count() ===
      v.count())
  }
}
