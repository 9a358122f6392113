package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // testdata tables are single ~50 MB parquet files; the 128 MB
      // default makes every scan one task. Smaller splits keep all
      // cores busy at these SFs (at 100 TB the default is fine).
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // filterless COUNT/MIN/MAX answered from parquet footer stats
      // (exact; Spark refuses the pushdown where NaN could lie)
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: throwaway passes so the first measured queries don't pay
    // JIT + codegen-compiler start-up (was inflating them ~5x). The two
    // alphabetically-first registered queries absorb whatever the
    // flagship's plan shape doesn't touch (catalog ops, union-of-aggs).
    val warm: Seq[() => org.apache.spark.sql.DataFrame] =
      Seq(() => SparkEntry.entry(spark)) ++
        SparkEntry.queries.toSeq.sortBy(_._1).take(2)
          .map { case (_, fn) => () => fn(spark, sfDir) }
    warm.foreach { f =>
      try f().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    }
    // noop sink: fully materializes every row (honest timing for the
    // ORDER-BY-heavy queries, whose sorts a bare count() would let the
    // optimizer elide) without paying for an output format.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def jmap(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Full per-query map for local inspection (stderr + file) …
    System.err.println(s"[bench] full: ${jmap(results)}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_full.json"), jmap(results))
    catch { case _: Throwable => }
    // … but the stdout contract line must survive the driver's 2000-char
    // output-tail window (sbt appends a ~75-char "[success]" line after
    // us). r02's line carried all 68 queries, ran ~2.3 KB, and the tail
    // truncated its head — the driver parsed nothing. Report the slowest
    // 20 queries (the informative ones) and keep the line under ~1 KB.
    val slowest = results.sortBy(-_._2).take(20).sortBy(_._1)
    // Calibration: a fixed single-thread arithmetic loop. This VM shows
    // 3-8x run-to-run variance from hypervisor CPU steal (identical
    // binaries measured 65s and 571s twenty minutes apart); cal_sec makes
    // an inflated run self-identifying — ~0.5s clean, scales with steal.
    val c0 = System.nanoTime()
    var acc = 0L
    var i = 0L
    while (i < 2000000000L) { acc += i ^ (acc >>> 3); i += 1 }
    val cal = (System.nanoTime() - c0) / 1e9
    if (acc == 42) System.err.println("") // defeat dead-code elimination
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"cal_sec":${fmt(cal)},"queries":${jmap(slowest)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
