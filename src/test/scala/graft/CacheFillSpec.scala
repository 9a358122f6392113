package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

/** Pins the CacheFill contract the r20 verdict found a crack in: the
  * per-(cache, key) lock map keyed lock entries by the cache map's own
  * STRUCTURAL hashCode, which mutates with content (and two empty
  * TrieMaps compare equal) — so threads cold-filling the same key while
  * OTHER keys' fills churned the map could resolve different locks, run
  * duplicate builds, and orphan the losing build's persist() for the
  * session. Lock keying is identity-based now; these tests race exactly
  * that workload and assert ONE build per key and ZERO orphaned
  * persists after invalidate. */
class CacheFillSpec extends SparkTestBase {

  test("concurrent cold fills of one key run the build exactly once while other keys churn the map") {
    val cache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
    val builds = new AtomicInteger(0)
    val nRacers = 4
    val nChurners = 4
    // all racers + churners release together for maximal interleaving
    val gate = new CyclicBarrier(nRacers + nChurners)
    val done = new CountDownLatch(nRacers + nChurners)
    val pool = Executors.newFixedThreadPool(nRacers + nChurners)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    try {
      (1 to nRacers).foreach { _ =>
        pool.execute { () =>
          gate.await(30, TimeUnit.SECONDS)
          try CacheFill(cache, "hot") {
            builds.incrementAndGet()
            val df = spark.range(100).toDF("id").persist()
            df.count() // materialize so the persist registers
            df
          } finally done.countDown()
        }
      }
      // churners mutate the MAP (insert other keys) mid-race — the exact
      // interleaving that defeated structural lock keying
      (1 to nChurners).foreach { i =>
        pool.execute { () =>
          gate.await(30, TimeUnit.SECONDS)
          try CacheFill(cache, s"churn-$i") {
            val df = spark.range(10L + i).toDF("id").persist()
            df.count()
            df
          } finally done.countDown()
        }
      }
      assert(done.await(120, TimeUnit.SECONDS), "fill race did not finish")
      assert(builds.get() === 1,
        s"expected exactly one build of the hot key, got ${builds.get()}")
      // every persist is reachable through the map: invalidate releases
      // them all — no orphan survives in the CacheManager
      CacheFill.invalidate(cache)(_.unpersist(blocking = true))
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
      assert(leaked.isEmpty,
        s"orphaned persisted RDDs after invalidate: $leaked")
    } finally pool.shutdownNow()
  }

  test("two distinct caches do not alias each other's locks (empty maps compare structurally equal)") {
    val a = scala.collection.concurrent.TrieMap.empty[String, Int]
    val b = scala.collection.concurrent.TrieMap.empty[String, Int]
    val inA = new CountDownLatch(1)
    val releaseA = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      pool.execute { () =>
        CacheFill(a, "k") {
          inA.countDown()
          releaseA.await(30, TimeUnit.SECONDS)
          1
        }: Unit
      }
      assert(inA.await(30, TimeUnit.SECONDS), "builder A never started")
      // with structural (content-equal) lock keys this fill would block
      // behind A's in-progress build; identity keys keep them independent
      val bDone = pool.submit[Int](() => CacheFill(b, "k")(2))
      assert(bDone.get(10, TimeUnit.SECONDS) === 2,
        "unrelated cache's cold fill serialized behind another cache's build")
      releaseA.countDown()
    } finally { releaseA.countDown(); pool.shutdownNow() }
  }
}
