package graft.extensions

import graft.{EngineCaches, SparkEntry, SparkTestBase}

/** The per-(session, dir) persisted caches must be releasable: a
  * long-lived engine calls EngineCaches.invalidateAll() between
  * workloads, and results must be identical before/after (unpersist
  * only forces recomputation). */
class CacheSpec extends SparkTestBase {

  test("invalidateAll releases every persisted RDD and queries still run") {
    val before = SparkEntry.queries("dedup_minhash_pairs")(spark, sf0001)
      .collect().toSeq
    SparkEntry.queries("sim_knn_ivf")(spark, sf0001).collect()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected signature/vector caches to be persisted after dedup+sim runs")

    EngineCaches.invalidateAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"caches leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")

    val after = SparkEntry.queries("dedup_minhash_pairs")(spark, sf0001)
      .collect().toSeq
    assert(after == before)
    EngineCaches.invalidateAll()
  }

  test("q28 leaves no temp views behind") {
    val df = SparkEntry.queries("q28_corr_subquery")(spark, sf0001)
    // views are dropped before execution — the analyzed plan must still run
    assert(df.count() >= 0)
    val leaked = spark.catalog.listTables().collect()
      .filter(_.name.contains("q28"))
    assert(leaked.isEmpty, s"leaked views: ${leaked.map(_.name).mkString(",")}")
  }
}
