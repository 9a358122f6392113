package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL UPDATE and MERGE INTO lowered through GraftSqlExtensions onto
  * the commit log's row-level machinery: semantics, atomicity, time
  * travel, and the loud-refusal paths for untranslatable shapes. */
class GraftSqlDmlSpec extends SparkTestBase {

  private val cat = "gdml"

  private def fresh(rows: (Long, Long)*): (String, String) = {
    val wh = Files.createTempDirectory("graft-dml").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    if (rows.nonEmpty)
      spark.sql(s"INSERT INTO $cat.t VALUES " +
        rows.map { case (i, v) => s"($i, $v)" }.mkString(", "))
    (wh, s"$wh/t")
  }

  private def state(dir: String): Map[Long, Long] = {
    import spark.implicits._
    SnapshotLog.readCurrent(spark, dir).get
      .select(col("id").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect().toMap
  }

  test("SQL UPDATE lands as ONE pos-delete + replacement snapshot") {
    val (_, dir) = fresh(1L -> 10L, 2L -> 20L, 3L -> 30L)
    spark.sql(s"UPDATE $cat.t SET v = v * 2 WHERE id >= 2")
    assert(state(dir) === Map(1L -> 10L, 2L -> 40L, 3L -> 60L))
    // create + insert + update = 3 snapshots; the update wrote slots
    assert(SnapshotLog.snapshotIds(spark, dir) === Seq(1L, 2L, 3L))
    val cur = SnapshotLog.currentSnapshot(spark, dir).get
    assert(cur.posDeletes.map(_.rows).sum === 2L)
    // time travel still sees the pre-update state through SQL
    import spark.implicits._
    assert(spark.sql(s"SELECT v FROM $cat.t VERSION AS OF 2 ORDER BY v")
      .as[Long].collect().toSeq === Seq(10L, 20L, 30L))
  }

  test("SQL UPDATE/DELETE with range predicates stay exact under pruning") {
    val (_, dir) = fresh((1L to 40L).map(i => i -> i * 10): _*)
    // id carries no manifest bounds here — pruning must keep every file
    // (conservative) and results must be identical to the unpruned path
    spark.sql(s"UPDATE $cat.t SET v = 0 WHERE id > 10 AND id <= 20")
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (1, 2, 3)")
    val m = state(dir)
    assert(m.size === 37)
    assert((11L to 20L).forall(m(_) == 0L))
    assert(m(21L) === 210L && !m.contains(2L))
  }

  test("SQL UPDATE with CASE and arithmetic translates; no-match is a no-op") {
    val (_, dir) = fresh(1L -> 10L, 2L -> 20L)
    spark.sql(s"UPDATE $cat.t SET v = CASE WHEN v < 15 THEN v + 1 ELSE v - 1 END")
    assert(state(dir) === Map(1L -> 11L, 2L -> 19L))
    val n = SnapshotLog.snapshotIds(spark, dir).size
    spark.sql(s"UPDATE $cat.t SET v = 0 WHERE id > 100")
    assert(SnapshotLog.snapshotIds(spark, dir).size === n) // nothing matched
  }

  test("SQL MERGE INTO: delete, conditional update, insert *, one snapshot") {
    val (_, dir) = fresh(1L -> 10L, 2L -> 20L, 3L -> 30L)
    import spark.implicits._
    Seq(1L -> -1L, 2L -> 99L, 3L -> 5L, 4L -> 40L).toDF("id", "v")
      .createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING dml_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // 1 deleted; 2 upgraded to 99; 3 kept (5 < 30); 4 inserted
    assert(state(dir) === Map(2L -> 99L, 3L -> 30L, 4L -> 40L))
    assert(SnapshotLog.snapshotIds(spark, dir) === Seq(1L, 2L, 3L))
    assert(SnapshotLog.currentSnapshot(spark, dir).get.operation === "merge-into")
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE: delete + tombstone full sync") {
    val (_, dir) = fresh(1L -> 10L, 2L -> 60L, 3L -> 30L)
    import spark.implicits._
    Seq(1L -> 11L, 4L -> 40L).toDF("id", "v")
      .createOrReplaceTempView("dml_fs_src")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING dml_fs_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.v > 50 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""".stripMargin)
    // 1 updated, 2 deleted (60 > 50), 3 tombstoned, 4 inserted
    assert(state(dir) === Map(1L -> 11L, 3L -> -1L, 4L -> 40L))
    assert(SnapshotLog.currentSnapshot(spark, dir).get.operation === "merge-into")
  }

  test("SQL MERGE with explicit INSERT columns and expressions") {
    val (_, dir) = fresh(1L -> 10L)
    import spark.implicits._
    Seq(5L -> 50L).toDF("sid", "sv").createOrReplaceTempView("dml_src2")
    spark.sql(
      s"""MERGE INTO $cat.t AS t USING dml_src2 AS s ON t.id = s.sid
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.sid, s.sv + 1)""".stripMargin)
    assert(state(dir) === Map(1L -> 10L, 5L -> 51L))
  }

  test("untranslatable DML shapes are refused loudly, basis intact") {
    val (_, dir) = fresh(1L -> 10L)
    // subquery predicate
    val e1 = intercept[Exception](spark.sql(
      s"UPDATE $cat.t SET v = 0 WHERE id IN (SELECT id FROM $cat.t)"))
    assert(e1.getMessage.contains("cannot translate") ||
      e1.getMessage.toLowerCase.contains("subquer"))
    // non-equi merge condition
    import spark.implicits._
    Seq(1L -> 1L).toDF("id", "v").createOrReplaceTempView("dml_src3")
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.t AS t USING dml_src3 AS s ON t.id > s.id
         |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(e2.getMessage.contains("cannot translate"))
    assert(state(dir) === Map(1L -> 10L))
  }
}
