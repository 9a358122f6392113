package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Grid (z-order-class) clustered rewrite: multi-dimension manifest
  * bounds, pruning on every clustered column, and the refusal paths. */
class GridClusterSpec extends SparkTestBase {

  private def build(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-grid").toString + "/t"
    // 4 quadrants of a 2-D space, deliberately interleaved in one file
    val rows = for (a <- 0 until 20; b <- 0 until 20)
      yield (a.toLong * 20 + b, a.toDouble, b.toDouble)
    val df = rows.toDF("id", "x", "y")
    SnapshotLog.withTableLock(dir) {
      val files = SnapshotLog.writeData(spark, dir, df, None, statsCol = "x")
      SnapshotLog.commit(spark, dir, "append", files, df.schema, parent = None)
    }
    dir
  }

  test("each cell's manifest entry carries bounds for every dimension") {
    val dir = build()
    val snap = SnapshotLog.clusterByGrid(spark, dir,
      Seq("x" -> Seq(10.0), "y" -> Seq(10.0)))
    assert(snap.files.size === 4) // 2×2 grid, all cells non-empty
    snap.files.foreach { f =>
      assert(f.boundsColumn === "x")
      assert(f.minLsn.isDefined && f.maxLsn.isDefined)
      assert(f.extraBounds.contains("y"))
      assert(f.boundsFor("y").isDefined)
      assert(f.boundsFor("z").isEmpty) // unrecorded column: no bounds
    }
    // every cell spans < the full range on BOTH dimensions
    snap.files.foreach { f =>
      val (xm, xx) = f.boundsFor("x").get
      val (ym, yx) = f.boundsFor("y").get
      assert(BigDecimal(xx) - BigDecimal(xm) <= 9)
      assert(BigDecimal(yx) - BigDecimal(ym) <= 9)
    }
  }

  test("range predicates prune on either dimension; results stay complete") {
    import spark.implicits._
    val dir = build()
    SnapshotLog.clusterByGrid(spark, dir, Seq("x" -> Seq(10.0), "y" -> Seq(10.0)))
    val snap = SnapshotLog.currentSnapshot(spark, dir).get
    // x-range hits 2 of 4 cells; y-range likewise; the pre-rewrite
    // snapshot's single file had bounds for x only — y never pruned there
    assert(SnapshotLog.pruneByStats(snap, "x", 0, 9).size === 2)
    assert(SnapshotLog.pruneByStats(snap, "y", 10, 19).size === 2)
    val pre = SnapshotLog.snapshotAt(spark, dir, 1)
    assert(SnapshotLog.pruneByStats(pre, "y", 10, 19).size === pre.files.size)
    val out = SnapshotLog.readStatsRange(spark, dir, snap, "y", 10, 19)
      .filter(col("y") >= 10).select(col("id").cast("long")).as[Long]
      .collect().toSet
    assert(out.size === 20 * 10)
    // SQL reads prune on the second dimension through the catalog too
    spark.conf.set("spark.sql.catalog.ggrid", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ggrid.warehouse",
      dir.stripSuffix("/t"))
    val sqlOut = spark.sql("SELECT id FROM ggrid.t WHERE y >= 10")
    assert(sqlOut.count() === 200L)
    val (kept, total) = GraftScanStats.lastScan(dir).get
    assert(total === 4L)
    assert(kept === 2L)
  }

  test("multi-row-group numeric bounds fold numerically, never lexically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-grid-rg").toString + "/t"
    val conf = spark.sparkContext.hadoopConfiguration
    val old = conf.get("parquet.block.size")
    conf.set("parquet.block.size", "1048576") // force many row groups
    try {
      // ascending values 0.0 .. ~1000.0: later row groups carry maxes
      // like "1000.0" that sort lexically BELOW earlier "262.1" maxes —
      // a lexical fold would record max < real max and pruning would
      // silently skip files containing matching rows
      val df = (0 until 1000000).map(i => (i.toLong, i * 0.001))
        .toDF("id", "v").repartition(1).sortWithinPartitions("id")
      SnapshotLog.withTableLock(dir) {
        val files = SnapshotLog.writeData(spark, dir, df, None, statsCol = "v")
        SnapshotLog.commit(spark, dir, "append", files, df.schema, parent = None)
      }
      val f = SnapshotLog.currentSnapshot(spark, dir).get.files.head
      val (mn, mx) = f.boundsFor("v").get
      assert(BigDecimal(mn) === BigDecimal(0))
      assert(BigDecimal(mx) > BigDecimal(999))
      // and the pruning built on those bounds keeps the file for a
      // query range near the true max
      val snap = SnapshotLog.currentSnapshot(spark, dir).get
      assert(SnapshotLog.pruneByStats(snap, "v", 990, 1000).nonEmpty)
    } finally {
      if (old == null) conf.unset("parquet.block.size")
      else conf.set("parquet.block.size", old)
    }
  }

  test("refusals: one dimension, bad splits, live deletes") {
    val dir = build()
    intercept[IllegalArgumentException](
      SnapshotLog.clusterByGrid(spark, dir, Seq("x" -> Seq(10.0))))
    intercept[IllegalArgumentException](
      SnapshotLog.clusterByGrid(spark, dir,
        Seq("x" -> Seq(10.0, 5.0), "y" -> Seq(10.0))))
    SnapshotLog.deleteWhere(spark, dir, col("id") === 0L)
    intercept[IllegalArgumentException](
      SnapshotLog.clusterByGrid(spark, dir,
        Seq("x" -> Seq(10.0), "y" -> Seq(10.0))))
  }
}
