package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The native DSv2 batch path: eligible snapshots plan a BatchScanExec
  * (columnar parquet, no V1 bridge) with identical results; MOR/hive/
  * renamed-era snapshots fall back to the bridge; runtime (DPP) filters
  * from a joined dimension prune manifest files before any footer
  * opens; plan-time statistics come from the manifest. */
class GraftBatchScanSpec extends SparkTestBase {

  private val cat = "gbatchtest"

  private def register(wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
  }

  private def lsn(i: Int): String = f"$i%016d"

  private def commitDays(dir: String, rows: Seq[(Long, Long, String, String)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("id", "v", graft.ingest.Cdc.LsnColumn, "_cdc_date")
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir)
      val files = SnapshotLog.writeData(spark, dir, df, Some("_cdc_date"))
      SnapshotLog.commit(spark, dir, "append",
        cur.toSeq.flatMap(_.files) ++ files, df.schema, parent = cur,
        deletes = cur.toSeq.flatMap(_.deletes),
        posDeletes = cur.toSeq.flatMap(_.posDeletes))
    }
  }

  /** 4 days × 3 ids each. */
  private def buildTable(): (String, String) = {
    val wh = Files.createTempDirectory("graft-batch").toString
    val dir = s"$wh/ns/t"
    val rows = for {
      d <- 1 to 4
      i <- 1 to 3
    } yield ((d * 10 + i).toLong, (d * 100 + i).toLong,
      lsn(d * 10 + i), f"2024-01-0$d%d")
    commitDays(dir, rows)
    register(wh)
    (wh, dir)
  }

  private def plan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("an eligible snapshot plans the native BatchScan with identical results") {
    val (_, dir) = buildTable()
    val df = spark.sql(
      s"SELECT id, v FROM $cat.ns.t WHERE _cdc_date = '2024-01-02' ORDER BY id")
    val p = plan(df)
    assert(p.contains("BatchScan"), s"expected native BatchScan:\n$p")
    assert(!p.contains("GraftSnapshot("), s"V1 bridge in plan:\n$p")
    import spark.implicits._
    assert(df.select(col("id").cast("long")).as[Long].collect().toSeq.sorted
      === Seq(21L, 22L, 23L))
    // static partition filter pruned manifest entries before planning
    val (kept, total) = GraftScanStats.lastScan(dir).get
    assert(total === 4L && kept === 1L)
  }

  test("columnar parquet readers are active on the batch path") {
    buildTable()
    val df = spark.sql(s"SELECT sum(v) AS s FROM $cat.ns.t")
    val p = plan(df)
    assert(p.contains("ColumnarToRow"), s"vectorized read not planned:\n$p")
  }

  test("live POS-deletes keep the columnar batch path (anti-join above the scan)") {
    buildTable()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id = 21")
    val df = spark.sql(s"SELECT id FROM $cat.ns.t")
    val p = plan(df)
    assert(p.contains("BatchScan"), s"MOR read lost the batch path:\n$p")
    assert(p.contains("morData=true"), s"expected the MOR data scan:\n$p")
    assert(p.contains("ColumnarToRow"), s"vectorized read not planned:\n$p")
    assert(!p.contains("GraftSnapshot("), s"V1 bridge in plan:\n$p")
    import spark.implicits._
    val ids = df.as[Long].collect().toSeq.sorted
    assert(ids.length === 11 && !ids.contains(21L), s"wrong survivors: $ids")
  }

  test("live EQ-deletes rank by data-sequence-number on the batch path") {
    val (_, dir) = buildTable()
    import spark.implicits._
    // snapshot 2: an equality delete of id=21 (outranks snapshot 1 files)
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir).get
      val dels = SnapshotLog.writeDeletes(spark, dir,
        Seq(21L).toDF("id"), Seq("id"))
      SnapshotLog.commit(spark, dir, "mor-merge", cur.files, cur.schema,
        parent = Some(cur), deletes = cur.deletes ++ dels,
        posDeletes = cur.posDeletes)
    }
    // snapshot 3: id=21 re-appended with a HIGHER seq — the delete must
    // not outrank it (the seq comparison runs inside the rewrite's join)
    commitDays(dir, Seq((21L, 999L, lsn(99), "2024-01-02")))
    val df = spark.sql(s"SELECT id, v FROM $cat.ns.t")
    val p = plan(df)
    assert(p.contains("BatchScan") && p.contains("morData=true"),
      s"EQ-delete read lost the batch path:\n$p")
    assert(p.contains("ColumnarToRow"), s"vectorized read not planned:\n$p")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.count(_._1 == 21L) === 1, s"seq ranking wrong: $rows")
    assert(rows.contains((21L, 999L)) && !rows.contains((21L, 201L)))
    assert(rows.length === 12)
  }

  test("cached delete frames reuse ONE broadcast handle across queries") {
    val (_, dir) = buildTable()
    import spark.implicits._
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir).get
      val dels = SnapshotLog.writeDeletes(spark, dir,
        Seq(21L, 32L).toDF("id"), Seq("id"))
      SnapshotLog.commit(spark, dir, "mor-merge", cur.files, cur.schema,
        parent = Some(cur), deletes = cur.deletes ++ dels,
        posDeletes = cur.posDeletes)
    }
    GraftBroadcastCache.reset()
    def q(): Long = spark.sql(s"SELECT sum(v) AS s FROM $cat.ns.t")
      .collect().head.getLong(0)
    // 1st read: first frame sighting stays LAZY (no row cache) — the
    // broadcast is a plain per-query exchange over the live aggregation
    val r1 = q()
    // 2nd read: the frame's rows enter the content cache and register;
    // the physical rule swaps in the reusing exchange → ONE compute
    val r2 = q()
    // 3rd read: same frame, same canonical key shape → a cache HIT,
    // no new broadcast job
    val df3 = spark.sql(s"SELECT sum(v) AS s FROM $cat.ns.t")
    val r3 = df3.collect().head.getLong(0)
    val p3 = df3.queryExecution.executedPlan.toString
    assert(p3.contains("GraftReusedBroadcastExchange"),
      s"reusing exchange not planned:\n$p3")
    assert(r1 === r2 && r2 === r3)
    assert(GraftBroadcastCache.computes.get() === 1L,
      s"expected one broadcast compute, got ${GraftBroadcastCache.computes.get()}")
    assert(GraftBroadcastCache.hits.get() >= 1L)
    // the kill switch restores the plain per-query exchange, same rows
    spark.conf.set("spark.graft.broadcastReuse.enabled", "false")
    try assert(q() === r1)
    finally spark.conf.set("spark.graft.broadcastReuse.enabled", "true")
  }

  test("AQE-less plans reuse the broadcast: ONE compute across N streaming triggers") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val (_, dir) = buildTable()
    import spark.implicits._
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir).get
      val dels = SnapshotLog.writeDeletes(spark, dir,
        Seq(21L, 32L).toDF("id"), Seq("id"))
      SnapshotLog.commit(spark, dir, "mor-merge", cur.files, cur.schema,
        parent = Some(cur), deletes = cur.deletes ++ dels,
        posDeletes = cur.posDeletes)
    }
    GraftBroadcastCache.reset()
    // stateful streaming disables AQE, so stage-prep rules never run on
    // its triggers — model that by turning AQE off session-wide: only
    // the columnar-rule application can swap the exchange here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hconf = spark.sparkContext.hadoopConfiguration
      val stage = Files.createTempDirectory("graft-brstream-stage").toString
      Seq((1L, 1L)).toDF("a", "b").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val fs = new Path(stage).getFileSystem(hconf)
      val part = fs.listStatus(new Path(stage))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      val srcDir = Files.createTempDirectory("graft-brstream-src").toString
      (1 to 3).foreach(i => FileUtil.copy(fs, part, fs,
        new Path(srcDir, s"f$i.parquet"), false, hconf))
      val srcSchema = spark.read.parquet(srcDir).schema
      val sums = new scala.collection.mutable.ArrayBuffer[Long]()
      val plans = new scala.collection.mutable.ArrayBuffer[String]()
      val ckpt = Files.createTempDirectory("graft-brstream-ckpt").toString
      // every trigger consults the MOR table the way a per-batch
      // enrichment read would — a fresh plan each time, AQE off
      val q = spark.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (_: DataFrame, _: Long) =>
          val df = spark.sql(s"SELECT sum(v) AS s FROM $cat.ns.t")
          sums += df.collect().head.getLong(0)
          plans += df.queryExecution.executedPlan.toString
          ()
        }
        .start()
      q.awaitTermination()
      assert(sums.size === 3 && sums.distinct.size === 1, sums.toString)
      // trigger 1 is the frame's LAZY first sighting (plain exchange);
      // triggers 2..3 swap in the reusing exchange with no AQE around
      assert(!plans.last.contains("AdaptiveSparkPlan"), plans.last)
      assert(plans.last.contains("GraftReusedBroadcastExchange"),
        s"columnar-rule swap missing without AQE:\n${plans.last}")
      assert(GraftBroadcastCache.computes.get() === 1L,
        s"expected one broadcast compute across triggers, " +
          s"got ${GraftBroadcastCache.computes.get()}")
      assert(GraftBroadcastCache.hits.get() >= 1L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("mixed eq-key ERAS stack one delete frame each; batch path kept, V1 agrees") {
    val (_, dir) = buildTable()
    import spark.implicits._
    // era 1: equality delete keyed on id (id=21 dies)
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir).get
      val dels = SnapshotLog.writeDeletes(spark, dir,
        Seq(21L).toDF("id"), Seq("id"))
      SnapshotLog.commit(spark, dir, "mor-merge", cur.files, cur.schema,
        parent = Some(cur), deletes = cur.deletes ++ dels,
        posDeletes = cur.posDeletes)
    }
    // era 2: the merge keys changed — a delete keyed on v (v=302 dies);
    // both eras' deletes are LIVE in the head snapshot simultaneously
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir).get
      val dels = SnapshotLog.writeDeletes(spark, dir,
        Seq(302L).toDF("v"), Seq("v"))
      SnapshotLog.commit(spark, dir, "mor-merge", cur.files, cur.schema,
        parent = Some(cur), deletes = cur.deletes ++ dels,
        posDeletes = cur.posDeletes)
    }
    val snap = SnapshotLog.currentSnapshot(spark, dir).get
    assert(snap.deletes.map(_.eqCols).distinct.size === 2)
    assert(GraftMorScan.eligible(snap), "mixed eras must stay batch-eligible")
    val df = spark.sql(s"SELECT id, v FROM $cat.ns.t")
    val p = plan(df)
    assert(p.contains("BatchScan") && p.contains("morData=true"),
      s"mixed-era MOR read lost the batch path:\n$p")
    assert(!p.contains("GraftSnapshot("), s"V1 bridge in plan:\n$p")
    val batch = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!batch.exists(_._1 == 21L), s"id-era delete not applied: $batch")
    assert(!batch.exists(_._2 == 302L), s"v-era delete not applied: $batch")
    assert(batch.size === 10)
    // the V1 bridge stacks the same per-era frames — identical state
    spark.conf.set("spark.graft.morBatchScan.enabled", "false")
    try {
      val v1df = spark.sql(s"SELECT id, v FROM $cat.ns.t")
      val v1p = plan(v1df)
      assert(v1p.contains("GraftSnapshot("), s"expected V1 bridge:\n$v1p")
      assert(v1df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === batch)
    } finally spark.conf.set("spark.graft.morBatchScan.enabled", "true")
  }

  test("renamed eras keep the batch path: per-era readers request physical names by id") {
    val (_, dir2) = buildTable()
    SnapshotLog.renameColumn(spark, dir2, "v", "score")
    // pre-rename files store the column as 'v'; their era factory
    // requests 'v' at score's position, so old files serve real values
    val df2 = spark.sql(s"SELECT id, score FROM $cat.ns.t ORDER BY id")
    val p2 = plan(df2)
    assert(p2.contains("BatchScan"), s"renamed-era read lost the batch path:\n$p2")
    assert(p2.contains("ColumnarToRow"), s"vectorized read not planned:\n$p2")
    val rows = df2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size === 12 && rows.contains((21L, 201L)), s"wrong rows: $rows")
    // post-rename append (under the CURRENT schema): a MIXED-era
    // snapshot reads both layouts in one scan (partitions planned per
    // era, never cross-packed)
    spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
      s"(51, 501, '${lsn(51)}', '2024-01-05')")
    val df3 = spark.sql(s"SELECT id, score FROM $cat.ns.t ORDER BY id")
    assert(plan(df3).contains("BatchScan"))
    val rows3 = df3.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows3.size === 13 && rows3.contains((51L, 501L)))
    // a filter on the RENAMED column stays correct: it cannot push under
    // the era's physical name (the manifest and Spark's residual handle
    // it), and rows still come back exact
    import spark.implicits._
    val ids = spark.sql(s"SELECT id FROM $cat.ns.t WHERE score > 400")
      .as[Long].collect().toSeq.sorted
    assert(ids === Seq(41L, 42L, 43L, 51L), s"filtered renamed read wrong: $ids")
    // renamed era + live deletes: the MOR rewrite composes with per-era
    // batch reading
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id = 51")
    val df4 = spark.sql(s"SELECT id, score FROM $cat.ns.t")
    val p4 = plan(df4)
    assert(p4.contains("BatchScan") && p4.contains("morData=true"),
      s"renamed-era MOR read lost the batch path:\n$p4")
    assert(df4.count() === 12L)
  }

  test("a dropped-then-re-added column reads NULL from old files on the batch path") {
    val (_, dir) = buildTable()
    SnapshotLog.dropColumn(spark, dir, "v")
    spark.sql(s"ALTER TABLE $cat.ns.t ADD COLUMN v BIGINT")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
      s"(51, '${lsn(51)}', '2024-01-05', 777)")
    val df = spark.sql(s"SELECT id, v FROM $cat.ns.t ORDER BY id")
    val p = plan(df)
    assert(p.contains("BatchScan"),
      s"dropped/re-added era read lost the batch path:\n$p")
    // the old files PHYSICALLY store a 'v' column — its retired bytes
    // must NOT resurrect into the re-added field (fresh id, null reads)
    val rows = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(rows.size === 13)
    assert(rows.count(_._2 >= 0L) === 1 && rows.contains((51L, 777L)),
      s"dropped column bytes leaked: $rows")
  }

  test("spark.graft.morBatchScan.enabled=false restores the V1 MOR read") {
    buildTable()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id = 21")
    spark.conf.set("spark.graft.morBatchScan.enabled", "false")
    try {
      val df = spark.sql(s"SELECT id FROM $cat.ns.t")
      val p = plan(df)
      assert(!p.contains("BatchScan"), s"kill switch ignored:\n$p")
      import spark.implicits._
      assert(df.as[Long].collect().length === 11)
    } finally spark.conf.unset("spark.graft.morBatchScan.enabled")
  }

  test("URI-escaped partition values survive the columnar MOR path") {
    val wh = Files.createTempDirectory("graft-batch-esc").toString
    val dir = s"$wh/ns/esc"
    import spark.implicits._
    // hour-spec layout (directory names carry a space): the batch
    // scan's _abs constants and the delete frames' keys must all use
    // the percent-encoded lineage form or the joins drop/resurrect rows
    val df = Seq((1L, "2024-01-10"), (2L, "2024-01-10"), (3L, "2024-01-11"))
      .toDF("id", "day")
    SnapshotLog.withTableLock(dir) {
      val withHour = df.withColumn("_phour", concat(col("day"), lit(" 07")))
      val files = SnapshotLog.writeData(spark, dir, withHour,
        Some("_phour"), spec = Some("hour"))
      SnapshotLog.commit(spark, dir, "append", files, df.schema, parent = None)
    }
    SnapshotLog.withTableLock(dir) {
      val cur = SnapshotLog.currentSnapshot(spark, dir).get
      val dels = SnapshotLog.writeDeletes(spark, dir,
        Seq(1L).toDF("id"), Seq("id"))
      SnapshotLog.commit(spark, dir, "mor-merge", cur.files, cur.schema,
        parent = Some(cur), deletes = cur.deletes ++ dels,
        posDeletes = cur.posDeletes)
    }
    register(wh)
    spark.sql(s"DELETE FROM $cat.ns.esc WHERE id = 2")
    val q = spark.sql(s"SELECT id FROM $cat.ns.esc")
    val p = plan(q)
    assert(p.contains("BatchScan") && p.contains("morData=true"),
      s"escaped-partition MOR read lost the batch path:\n$p")
    assert(q.as[Long].collect().toSeq === Seq(3L))
  }

  test("runtime (DPP) filters prune manifest files on a MOR table") {
    val (wh, dir) = buildTable()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE id = 21")
    import spark.implicits._
    Seq(("2024-01-02", "keep"), ("2024-01-03", "keep"),
      ("2024-09-09", "drop"))
      .toDF("day", "tag").write.mode("overwrite").parquet(s"$wh/dim")
    spark.read.parquet(s"$wh/dim").createOrReplaceTempView("graft_batch_mor_dim")
    val useStats = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.get(useStats)
    spark.conf.set(useStats, "false")
    try {
      val df = spark.sql(
        s"""SELECT t._cdc_date, sum(t.v) AS sv
           |FROM $cat.ns.t t
           |JOIN graft_batch_mor_dim d ON t._cdc_date = d.day
           |WHERE d.tag = 'keep'
           |GROUP BY t._cdc_date ORDER BY t._cdc_date""".stripMargin)
      val out = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(out === Seq(
        ("2024-01-02", 405L),  // 202+203 (201's row pos-deleted)
        ("2024-01-03", 906L))) // 301+302+303
      val (kept, total) = GraftScanStats.lastScan(dir).get
      assert(total === 4L)
      assert(kept === 2L,
        s"runtime filters did not prune the MOR data scan (kept=$kept)")
    } finally spark.conf.set(useStats, prev)
  }

  test("runtime (DPP) filters from a joined dimension prune manifest files") {
    val (wh, dir) = buildTable()
    import spark.implicits._
    // the dimension must be a REAL relation: a filtered in-memory
    // LocalRelation constant-folds its predicate away and DPP sees no
    // selective filter
    Seq(("2024-01-02", "keep"), ("2024-01-03", "keep"),
      ("2024-09-09", "drop"))
      .toDF("day", "tag").write.mode("overwrite").parquet(s"$wh/dim")
    spark.read.parquet(s"$wh/dim").createOrReplaceTempView("graft_batch_dim")
    // DPP preconditions the fixture must exercise honestly: a SELECTIVE
    // predicate on the dimension, and (because these test tables are
    // kilobytes) the stats-based benefit heuristic disabled — at real
    // scale the fact-side stats clear it on their own
    val useStats = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.get(useStats)
    spark.conf.set(useStats, "false")
    try {
      val df = spark.sql(
        s"""SELECT t._cdc_date, sum(t.v) AS sv
           |FROM $cat.ns.t t
           |JOIN graft_batch_dim d ON t._cdc_date = d.day
           |WHERE d.tag = 'keep'
           |GROUP BY t._cdc_date ORDER BY t._cdc_date""".stripMargin)
      val out = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(out === Seq(
        ("2024-01-02", 606L),  // 201+202+203
        ("2024-01-03", 906L))) // 301+302+303
      // the scan saw the dim's days as runtime filters and skipped the
      // other two days' files at the MANIFEST
      val (kept, total) = GraftScanStats.lastScan(dir).get
      assert(total === 4L)
      assert(kept === 2L, s"runtime filters did not prune (kept=$kept)")
    } finally spark.conf.set(useStats, prev)
  }

  test("a bare LIMIT plans only enough files to cover it") {
    val (_, dir) = buildTable()
    import spark.implicits._
    val df = spark.sql(s"SELECT id FROM $cat.ns.t LIMIT 2")
    assert(df.as[Long].collect().length === 2)
    val (kept, total) = GraftScanStats.lastScan(dir).get
    assert(total === 4L)
    assert(kept === 1L, s"LIMIT 2 should read one 3-row file, read $kept")
    // a FILTERED limit must NOT truncate: n raw rows are not n matching
    // rows (Spark blocks the pushdown here; the scan guards it too)
    val df2 = spark.sql(s"SELECT id FROM $cat.ns.t WHERE v > 401 LIMIT 2")
    assert(df2.as[Long].collect().toSeq.sorted === Seq(42L, 43L))
    val (kept2, _) = GraftScanStats.lastScan(dir).get
    assert(kept2 === 4L, s"filtered limit truncated the scan (kept=$kept2)")
    // a CLAIMED-exact day filter is different: every kept file's rows
    // match, so the limit truncates over the pruned set (here to the
    // day's single 3-row file)
    val df3 = spark.sql(
      s"SELECT id FROM $cat.ns.t WHERE _cdc_date = '2024-01-02' LIMIT 2")
    assert(df3.as[Long].collect().length === 2)
    val (kept3, _) = GraftScanStats.lastScan(dir).get
    assert(kept3 === 1L, s"claimed-day limit read $kept3 files, wanted 1")
  }

  test("plan-time statistics come from the manifest (no V1 wrapper loss)") {
    val (_, dir) = buildTable()
    val df = spark.sql(s"SELECT id FROM $cat.ns.t WHERE _cdc_date = '2024-01-04'")
    // the LEAF relation's stats (the Project above scales by column
    // width) must be the pruned day's manifest bytes, not the
    // unknown-size default the V1 wrapper forces
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val leaf = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r
    }.head
    val snap = SnapshotLog.currentSnapshot(spark, dir).get
    val dayBytes = snap.files.filter(_.partition == "2024-01-04")
      .map(_.sizeBytes).sum
    assert(leaf.stats.sizeInBytes === BigInt(dayBytes),
      s"plan-time stats ${leaf.stats.sizeInBytes} != manifest bytes $dayBytes")
    assert(leaf.stats.rowCount.forall(_.toLong === 3L))
  }
}
