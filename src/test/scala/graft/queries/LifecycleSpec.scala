package graft.queries

import graft.SparkTestBase
import graft.ingest.CdcWriter
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Write-path behavior: day partition layout and partition pruning (Q18). */
class LifecycleSpec extends SparkTestBase {

  test("day-partitioned write prunes the scan on _cdc_date (Q18)") {
    val dir = Files.createTempDirectory("graft-prune").toString
    CdcWriter.write(CdcQueries.envelope(spark, sf0001), dir)

    val pruned = CdcWriter.read(spark, dir)
      .filter(col("_cdc_date").between("2024-01-05", "2024-01-11"))
    // the physical scan must carry a partition filter on _cdc_date and
    // select only the 7 matching day directories
    val explain = pruned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(explain.contains("PartitionFilters"), explain.take(2000))
    assert(explain.contains("_cdc_date"), explain.take(2000))

    val allDays = CdcWriter.read(spark, dir)
      .select("_cdc_date").distinct().count()
    val readDays = pruned.select("_cdc_date").distinct().count()
    assert(readDays === 7 && allDays > 25)
  }

  test("explain_analyze surfaces non-zero runtime metrics per operator") {
    val rows = graft.SparkEntry.queries("explain_analyze")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // at least one operator actually emitted rows, and a scan is present
    assert(rows.exists(r =>
      r.getAs[String]("metric") == "number of output rows" && r.getAs[Long]("value") > 0))
    assert(rows.exists(_.getAs[String]("operator").toLowerCase.contains("scan")))
  }

  test("DDL entry points reject non-identifier names before building SQL") {
    // ref internal/api/services/query.go:18-53: ^[a-zA-Z_][a-zA-Z0-9_]*$,
    // rejected before any SQL exists — injection can't reach the parser
    val base = java.nio.file.Files.createTempDirectory("graft-ident").toString
    for (bad <- Seq("events bad", "1abc", "a;drop table x", "a-b", "", "a.b")) {
      intercept[IllegalArgumentException] {
        Lifecycle.ensureTable(spark, bad, "t", "id BIGINT", base)
      }
      intercept[IllegalArgumentException] {
        Lifecycle.ensureTable(spark, "graft_ident_ns", bad, "id BIGINT", base)
      }
    }
    // a valid pair passes and is idempotent
    val fq = Lifecycle.ensureTable(spark, "graft_ident_ns", "t_1",
      "id BIGINT", base)
    assert(fq === "graft_ident_ns.t_1")
    assert(Lifecycle.ensureTable(spark, "graft_ident_ns", "t_1",
      "id BIGINT", base) === fq)
    spark.sql("DROP TABLE IF EXISTS graft_ident_ns.t_1")
    spark.sql("DROP NAMESPACE IF EXISTS graft_ident_ns")
  }

  test("catalog_describe covers every column of every table") {
    val rows = graft.SparkEntry.queries("catalog_describe")(spark, sf0001).collect()
    val expected = graft.Tables.names
      .map(t => t -> graft.Tables.load(spark, sf0001, t).schema.size).toMap
    val got = rows.groupBy(_.getAs[String]("table_name")).view.mapValues(_.length).toMap
    assert(got === expected)
    // the embeddings vector column surfaces as a typed array, not a blob
    assert(rows.exists(r => r.getAs[String]("column_name") == "embedding" &&
      r.getAs[String]("data_type") == "FLOAT[]"))
  }
}
