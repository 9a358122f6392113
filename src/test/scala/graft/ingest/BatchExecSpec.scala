package graft.ingest

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[BatchExec.withAqe]]'s reentrancy contract: nested and
  * concurrent uses on ONE session share a single saved previous value,
  * the conf stays enabled for every body still inside, and only the
  * last exit restores the engine's original conf — the r21 verdict's
  * hardening item (restore-last used to be safe only because every
  * caller set the same value). */
class BatchExecSpec extends AnyFunSuite with SparkTestBase {
  private val Key = "spark.sql.adaptive.enabled"

  test("nested withAqe restores the original value exactly once, at the outermost exit") {
    val df = spark.range(1).toDF("x")
    spark.conf.set(Key, "false")
    try {
      BatchExec.withAqe(df) {
        assert(spark.conf.get(Key) == "true")
        BatchExec.withAqe(df) {
          assert(spark.conf.get(Key) == "true")
        }
        // the INNER exit must not restore while the outer body still runs
        assert(spark.conf.get(Key) == "true")
      }
      assert(spark.conf.get(Key) == "false")
    } finally spark.conf.unset(Key)
  }

  test("concurrent sibling bodies never see the conf flipped off mid-body") {
    val df = spark.range(1).toDF("x")
    spark.conf.set(Key, "false")
    try {
      val flipped = new java.util.concurrent.atomic.AtomicInteger(0)
      import scala.collection.parallel.CollectionConverters._
      (1 to 8).par.foreach { _ =>
        BatchExec.withAqe(df) {
          (1 to 50).foreach { _ =>
            if (spark.conf.get(Key) != "true") flipped.incrementAndGet()
            Thread.`yield`()
          }
        }
      }
      assert(flipped.get == 0,
        s"a sibling's exit flipped AQE off under ${flipped.get} running bodies")
      assert(spark.conf.get(Key) == "false",
        "the last exit must restore the engine's original conf")
    } finally spark.conf.unset(Key)
  }

  test("cheapToRecompute: file scans and local data are cheap, cached filters stay cheap") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("batchexec").toString
    spark.range(10).toDF("x").write.mode("overwrite").parquet(s"$dir/t")
    val fileDf = spark.read.parquet(s"$dir/t").filter(col("x") > 2)
    assert(BatchExec.cheapToRecompute(fileDf), "a parquet-scan lineage is cheap")
    import spark.implicits._
    assert(BatchExec.cheapToRecompute(Seq(1, 2).toDF("x")), "local data is cheap")
    val cached = fileDf.persist()
    try {
      cached.count()
      assert(BatchExec.cheapToRecompute(cached.filter(col("x") > 3)),
        "a lineage over an already-persisted frame is cheap")
    } finally cached.unpersist(): Unit
  }
}
