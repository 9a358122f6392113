package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC event-model operators, generalized over any envelope DataFrame.
  *
  * Mirrors the reference's event model (`internal/cdc/types.go:11-56`:
  * Event{operation, timestamp, LSN, key columns, payload}) and the
  * materialize-current-state semantics its sample queries document
  * (`docs/query/sample-queries.sql:95-102`).
  *
  * Conventions (system columns, ref `internal/iceberg/types.go:179-201`):
  * `_cdc_operation` (INSERT|UPDATE|DELETE|TRUNCATE), `_cdc_timestamp`,
  * `_cdc_lsn` (sortable string), `_cdc_table`, `_cdc_schema`.
  *
  * Scale: all operators are window/groupBy over the key columns — state is
  * hash-partitioned by key, so they parallelize to arbitrary cluster sizes.
  * No driver-side collection anywhere.
  */
object Cdc {

  val OpColumn = "_cdc_operation"
  val TsColumn = "_cdc_timestamp"
  val LsnColumn = "_cdc_lsn"

  /** Version ordering within a key: timestamp, then LSN as tiebreak
    * (the reference orders by buffer insertion time; LSN is the total
    * order Postgres provides — `internal/cdc/buffer/postgres.go:134`). */
  private def versionOrder: Seq[Column] =
    Seq(col(TsColumn).desc, col(LsnColumn).desc)

  /** Latest version of every key, whatever the operation. */
  def latestVersions(envelope: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(versionOrder: _*)
    envelope.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Materialized current state: latest version per key, with keys whose
    * newest operation is DELETE removed (the table-as-of-now view). */
  def currentState(envelope: DataFrame, keyCols: Seq[String]): DataFrame =
    latestVersions(envelope, keyCols).filter(col(OpColumn) =!= "DELETE")

  /** Materialized current state honoring TRUNCATE markers: a TRUNCATE at
    * LSN t is a table-wide reset — every event at or before t is discarded
    * before the latest-per-key materialization (ref internal/cdc/source/
    * postgres/reader.go:237-242: TRUNCATE carries no row image, only its
    * position). The reset watermark is a 1-row aggregate crossed back in
    * via broadcast, so the operator stays fully distributed — no driver
    * collect of the marker, works per-table at any scale. */
  def currentStateWithTruncate(envelope: DataFrame, keyCols: Seq[String]): DataFrame = {
    val wm = envelope.agg(
      max(when(col(OpColumn) === "TRUNCATE", col(LsnColumn))).as("_trunc_lsn"))
    currentState(
      envelope.crossJoin(broadcast(wm))
        .filter(col(OpColumn) =!= "TRUNCATE" &&
          (col("_trunc_lsn").isNull || col(LsnColumn) > col("_trunc_lsn")))
        .drop("_trunc_lsn"),
      keyCols)
  }

  /** Ordered change history for a key predicate (ref sample-queries.sql:105-112). */
  def history(envelope: DataFrame, keyCols: Seq[String], pred: Column): DataFrame =
    envelope.filter(pred)
      .orderBy(keyCols.map(col) ++ Seq(col(TsColumn), col(LsnColumn)): _*)

  /** Count per operation type (ref sample-queries.sql:115-119). */
  def operationCounts(envelope: DataFrame): DataFrame =
    envelope.groupBy(col(OpColumn)).agg(count(lit(1)).as("n")).orderBy(col(OpColumn))

  /** Keys that appear more than once (duplicate / multi-version detection,
    * ref sample-queries.sql:166-169). */
  def multiVersionKeys(envelope: DataFrame, keyCols: Seq[String]): DataFrame =
    envelope.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n_versions"))
      .filter(col("n_versions") > 1)

  /** Freshness: newest CDC timestamp seen (lag vs wall clock is computed by
    * the caller to keep this deterministic; ref sample-queries.sql:179-182). */
  def freshness(envelope: DataFrame): DataFrame =
    envelope.agg(max(col(TsColumn)).as("latest_ts"), count(lit(1)).as("n_events"))
}
