package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hygiene pins on ref naming and DML write paths: digit-only tags stay
  * reachable, 'main' is reserved, selective writes never commit 0-row
  * part files, the merge source is evaluated exactly once, and
  * unsupported SQL MERGE forms fail loudly at analysis. */
class RefDmlHygieneSpec extends SparkTestBase {

  private val cat = "ghyg"

  private def fresh(rows: (Long, Long)*): (String, String) = {
    val wh = Files.createTempDirectory("graft-hyg").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    if (rows.nonEmpty)
      spark.sql(s"INSERT INTO $cat.t VALUES " +
        rows.map { case (i, v) => s"($i, $v)" }.mkString(", "))
    (wh, s"$wh/t")
  }

  test("digit-only tag resolves via VERSION AS OF when no such snapshot id") {
    val (_, dir) = fresh(1L -> 10L)
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 20)") // snapshot 3
    SnapshotLog.tag(spark, dir, "123", 2L) // no snapshot 123 exists
    import spark.implicits._
    assert(spark.sql(s"SELECT id FROM $cat.t VERSION AS OF '123' ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L))
    // a RETAINED snapshot id still wins over a same-named tag
    SnapshotLog.tag(spark, dir, "3", 2L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF '3'")
      .as[Long].head() === 2L)
    // a digit-only name too long for Long must fall through to the tag,
    // not overflow
    SnapshotLog.tag(spark, dir, "99999999999999999999", 2L)
    assert(spark.sql(
      s"SELECT id FROM $cat.t VERSION AS OF '99999999999999999999'")
      .as[Long].collect().toSeq === Seq(1L))
  }

  test("a pre-reservation tag named 'main' keeps its pinned meaning") {
    val (_, dir) = fresh(1L -> 10L)
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 20)")
    // simulate a tag created before 'main' was reserved (tag() now
    // refuses the name): write the ref file directly
    val md = new org.apache.hadoop.fs.Path(dir, SnapshotLog.MetaDirName)
    val fs = md.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(md, "ref-main.json"), false)
    out.write("""{"name":"main","snapshot_id":2}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    import spark.implicits._
    // the stranded tag resolves (snapshot 2 = 1 row), NOT the head (2)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'main'")
      .as[Long].head() === 1L)
  }

  test("'main' is reserved: neither a tag nor a branch may take it") {
    val (_, dir) = fresh(1L -> 10L)
    intercept[IllegalArgumentException] {
      SnapshotLog.tag(spark, dir, "main", 2L)
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.createBranch(spark, dir, "main")
    }
    // the implicit main head stays uniquely resolvable
    import spark.implicits._
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'main'")
      .as[Long].head() === 1L)
  }

  test("selective INSERT commits only row-bearing part files") {
    val (_, dir) = fresh()
    import spark.implicits._
    // 32 shuffle partitions over 3 rows: most write tasks are empty and
    // emit 0-row part files — none may enter the manifest
    spark.createDataset(Seq(1L, 2L, 3L)).toDF("id")
      .repartition(8).withColumn("v", col("id") * 10)
      .createOrReplaceTempView("hyg_src")
    spark.sql(s"INSERT INTO $cat.t SELECT id, v FROM hyg_src")
    val cur = SnapshotLog.currentSnapshot(spark, dir).get
    assert(cur.files.nonEmpty && cur.files.forall(_.rows > 0L))
    assert(cur.totalRows === 3L)
  }

  test("merge source is evaluated once: nondeterministic source stays consistent") {
    val (_, dir) = fresh()
    import spark.implicits._
    // a nondeterministic filter: re-evaluation per merge leg would pick
    // a different subset, so a key could both pass the dup check and
    // insert twice, or an inserted row vanish from the count
    val src = spark.range(500).toDF("id")
      .filter(rand() < 0.5).withColumn("v", col("id"))
    SnapshotLog.mergeInto(spark, dir, src, Seq("id"),
      Seq(SnapshotLog.NotMatchedInsert(None)))
    val ids = SnapshotLog.readCurrent(spark, dir).get
      .select("id").as[Long].collect().toSeq
    assert(ids.distinct.size === ids.size) // no key inserted twice
    assert(SnapshotLog.currentSnapshot(spark, dir).get.totalRows === ids.size.toLong)
  }

  test("MERGE WITH SCHEMA EVOLUTION is refused at analysis") {
    val (_, _) = fresh(1L -> 10L)
    import spark.implicits._
    Seq(1L -> 1L).toDF("id", "v").createOrReplaceTempView("hyg_src2")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t AS t
           |USING hyg_src2 AS s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("schema evolution"))
  }
}
