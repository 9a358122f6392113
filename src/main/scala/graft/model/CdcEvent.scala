package graft.model

import java.sql.Timestamp

/** CDC operation type.
  *
  * Mirrors the reference event model's operation enum
  * (ref internal/cdc/types.go:11-20: INSERT/UPDATE/DELETE/TRUNCATE).
  */
object Operation {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  val Truncate = "TRUNCATE"
  val all: Seq[String] = Seq(Insert, Update, Delete, Truncate)
}

/** The central CDC record (ref internal/cdc/types.go:23-56: Event{id, LSN,
  * txn, timestamp, schema, table, operation, before, after, keyColumns}).
  *
  * Where the reference carries `map[string]any` payloads, the Spark-native
  * shape keeps payloads as JSON strings at the envelope boundary and
  * projects them to typed columns per table as early as possible —
  * `InternalRow`s with real types are what Tungsten vectorizes; stringly
  * maps are what the reference's degenerate parquet suffered from
  * (ref internal/iceberg/writer/parquet.go:48-66, SURVEY §1.3).
  */
final case class CdcEvent(
    eventId: Long,
    lsn: String,
    txnId: Long,
    timestamp: Timestamp,
    schemaName: String,
    tableName: String,
    operation: String,
    beforeJson: String,
    afterJson: String,
    keyColumns: Seq[String])

/** A column of a captured table (ref internal/cdc/types.go:59-74). */
final case class SourceColumn(
    name: String,
    pgType: String,
    nullable: Boolean = true,
    primaryKey: Boolean = false)

/** A versioned table schema snapshot (ref internal/cdc/types.go:77-95,
  * persisted in philotes.cdc_schema_history). */
final case class TableSchemaVersion(
    schemaName: String,
    tableName: String,
    columns: Seq[SourceColumn],
    version: Int,
    capturedAtLsn: String)
