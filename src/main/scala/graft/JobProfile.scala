package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-structure evidence tool for the optimization rounds: runs named
  * queries under the exact Bench session configuration with a listener
  * attached, and prints one line per Spark job (sequence, duration,
  * task count) plus a per-query summary (jobs, tasks, wall). This is
  * how "per-batch job count down" claims in OPTIMIZATION_r<k>.md are
  * measured rather than asserted — the Spark UI is disabled in the
  * bench session, so the listener stands in for the event log.
  *
  * Usage: `runMain graft.JobProfile <query>...` (env like Bench). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", (128L * 1024).toString) // match Bench
      .config("spark.sql.parquet.aggregatePushDown", "true")
      .config("spark.sql.extensions", "graft.lake.GraftSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // extra session conf for A/B experiments, e.g.
    // JOBPROFILE_CONF='spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider'
    sys.env.get("JOBPROFILE_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val taskCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val tasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(),
          s"stages=${js.stageInfos.size} tasks=$tasks"))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        taskCount.addAndGet(sc.stageInfo.numTasks): Unit
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = Option(starts.remove(je.jobId))
          .getOrElse((System.nanoTime(), "?"))
        val ms = (System.nanoTime() - t0) / 1e6
        jobs.put(je.jobId, (ms.toLong, 0))
        jobLines.add(f"    job ${je.jobId}%4d  $ms%8.1f ms  ${desc.take(90)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      // one unmeasured fixture-building pass so the profiled pass
      // matches a bench re-measure's state (fixtures cached)
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[profile] warm $name: $e") }
      // COLD mode: drop the engine's persisted caches so the measured
      // pass pays the same fills a fresh bench pass would (the dedup/
      // similarity/text queries otherwise profile their cache-hit path)
      if (sys.env.contains("JOBPROFILE_COLD")) EngineCaches.invalidateAll()
      jobs.clear(); jobLines.clear(); taskCount.set(0)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[profile] $name: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggler job-end events land
      Thread.sleep(300)
      println(f"$name: jobs=${jobs.size} tasks=${taskCount.get} wall=$wall%.2fs")
      if (sys.env.contains("JOBPROFILE_VERBOSE"))
        jobLines.forEach(l => println(l))
    }
    spark.stop()
  }
}
