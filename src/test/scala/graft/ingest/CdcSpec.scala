package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC operator semantics on a hand-built envelope. */
class CdcSpec extends SparkTestBase {

  private lazy val envelope: DataFrame = {
    import spark.implicits._
    // key 1: INSERT then UPDATE; key 2: INSERT then DELETE; key 3: INSERT
    Seq(
      (1L, "INSERT", "2024-01-01 00:00:00", "0001", 10.0),
      (1L, "UPDATE", "2024-01-02 00:00:00", "0002", 11.0),
      (2L, "INSERT", "2024-01-01 12:00:00", "0003", 20.0),
      (2L, "DELETE", "2024-01-03 00:00:00", "0004", 0.0),
      (3L, "INSERT", "2024-01-02 06:00:00", "0005", 30.0),
    ).toDF("id", Cdc.OpColumn, "ts_s", Cdc.LsnColumn, "value")
      .withColumn(Cdc.TsColumn, col("ts_s").cast("timestamp")).drop("ts_s")
  }

  test("latestVersions keeps exactly one row per key, newest wins") {
    val latest = Cdc.latestVersions(envelope, Seq("id"))
      .orderBy("id").collect()
    assert(latest.map(_.getAs[String](Cdc.LsnColumn)).toSeq === Seq("0002", "0004", "0005"))
  }

  test("currentState drops keys whose newest op is DELETE") {
    val state = Cdc.currentState(envelope, Seq("id")).orderBy("id").collect()
    assert(state.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(state.head.getAs[Double]("value") === 11.0)
  }

  test("asOfTimestamp reconstructs historical state (Q5 emulation)") {
    // as of Jan 2 00:30 — key 1 updated, key 2 still alive, key 3 not yet
    val asOf = TimeTravel.asOfTimestamp(envelope, Seq("id"),
      lit("2024-01-02 00:30:00").cast("timestamp")).orderBy("id").collect()
    assert(asOf.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(asOf.head.getAs[Double]("value") === 11.0)
  }

  test("asOfLsn reconstructs by log position") {
    val asOf = TimeTravel.asOfLsn(envelope, Seq("id"), lit("0003"))
      .orderBy("id").collect()
    assert(asOf.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("multiVersionKeys finds keys with history") {
    val multi = Cdc.multiVersionKeys(envelope, Seq("id")).orderBy("id").collect()
    assert(multi.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("currentStateWithTruncate resets the table at the newest marker") {
    import spark.implicits._
    // TRUNCATE at lsn 0003: keys 1-2's earlier rows are discarded; key 2's
    // DELETE (0004) and key 3's INSERT (0005) are after the reset
    val marker = Seq((null.asInstanceOf[java.lang.Long], "TRUNCATE",
        "2024-01-01 18:00:00", "0003", null.asInstanceOf[java.lang.Double]))
      .toDF("id", Cdc.OpColumn, "ts_s", Cdc.LsnColumn, "value")
      .withColumn(Cdc.TsColumn, col("ts_s").cast("timestamp")).drop("ts_s")
      .select(envelope.columns.map(col): _*)
    val state = Cdc.currentStateWithTruncate(
      envelope.unionByName(marker), Seq("id")).orderBy("id").collect()
    // key 1's UPDATE (0002) is at/before the marker → gone; key 2's newest
    // surviving op is DELETE → dropped; only key 3 survives
    assert(state.map(_.getAs[Long]("id")).toSeq === Seq(3L))
  }

  test("currentStateWithTruncate without a marker equals currentState") {
    val a = Cdc.currentStateWithTruncate(envelope, Seq("id"))
      .orderBy("id").collect().toSeq
    val b = Cdc.currentState(envelope, Seq("id")).orderBy("id").collect().toSeq
    assert(a === b)
  }
}
