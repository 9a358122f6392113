package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Decoder for Debezium-format CDC envelopes (the lingua franca of
  * Postgres logical replication streams; the reference's pgstream emits
  * an equivalent shape it converts in `convertEvent`,
  * ref internal/cdc/source/postgres/reader.go:172-242).
  *
  * Input: a DataFrame with one JSON string column holding
  * `{"before":{...}|null, "after":{...}|null, "op":"c|r|u|d|t",
  *   "ts_ms":..., "source":{"schema":..., "table":..., "lsn":..., "txId":...}}`.
  * Output: typed `before`/`after` structs (per-table payload schema from
  * [[graft.model.SchemaBuilder]]) plus the `_cdc_*` system columns —
  * a pure projection, fully codegen'd, no UDFs.
  *
  * Op mapping (ref reader.go action mapping I/U/D/T): c (create) and
  * r (snapshot read) → INSERT; u → UPDATE; d → DELETE; t → TRUNCATE.
  */
object EnvelopeDecoder {

  /** Zero-padded sortable LSN string — the total order Postgres provides
    * (ref internal/cdc/types.go LSN; string form keeps it portable). */
  def lsnString(lsn: Column): Column = lpad(lsn.cast("string"), 16, "0")

  def opFromDebezium(op: Column): Column =
    when(op.isin("c", "r"), "INSERT")
      .when(op === "u", "UPDATE")
      .when(op === "d", "DELETE")
      .when(op === "t", "TRUNCATE")
      .otherwise("UNKNOWN")

  /** Decode a JSON envelope column into the typed CDC envelope. */
  def decode(raw: DataFrame, jsonCol: String, payloadSchema: StructType): DataFrame = {
    val envelopeSchema = new StructType()
      .add("before", payloadSchema)
      .add("after", payloadSchema)
      .add("op", "string")
      .add("ts_ms", "long")
      .add("source", new StructType()
        .add("schema", "string").add("table", "string")
        .add("lsn", "long").add("txId", "long"))
    raw
      .withColumn("_env", from_json(col(jsonCol), envelopeSchema))
      .select(
        col("_env.before").as("before"),
        col("_env.after").as("after"),
        opFromDebezium(col("_env.op")).as(Cdc.OpColumn),
        timestamp_millis(col("_env.ts_ms")).as(Cdc.TsColumn),
        lsnString(col("_env.source.lsn")).as(Cdc.LsnColumn),
        col("_env.source.schema").as("_cdc_schema"),
        col("_env.source.table").as("_cdc_table"),
        col("_env.source.txId").as("_cdc_txid"))
  }

  /** Flatten the row image a reader would query: after for upserts,
    * before for deletes (TRUNCATE rows carry no image — ref
    * reader.go:237-238, represented as all-null payload). */
  def flattened(decoded: DataFrame): DataFrame = {
    val image = when(col(Cdc.OpColumn) === "DELETE", col("before"))
      .otherwise(col("after"))
    decoded.withColumn("_image", image)
      .select(col("_image.*"),
        col(Cdc.OpColumn), col(Cdc.TsColumn), col(Cdc.LsnColumn),
        col("_cdc_schema"), col("_cdc_table"), col("_cdc_txid"))
  }
}

/** Schema-evolving decoder for a live stream: the reference's
  * BuildFromEvents → MergeSchemas → ensureTable chain (ref internal/
  * iceberg/schema/schema.go:25-52,149-174, writer/writer.go:197-253)
  * applied per micro-batch. Each batch's payload schema is INFERRED from
  * its raw JSON (a distributed `spark.read.json` schema pass — After
  * wins, Before fills gaps), add-only-merged into the registered schema
  * ([[graft.model.SchemaBuilder.merge]]: existing fields keep position
  * and type, new fields append, version bumps), and the batch decodes
  * with the MERGED schema — so a column that appears mid-stream starts
  * landing in the lake from its first batch, while files written before
  * it read back as null under a mergeSchema scan.
  *
  * Scale note: TYPE inference is SAMPLE-BOUNDED. A WAL batch is
  * LSN-ordered and schema drift is MONOTONE — a column (or a widened
  * type) that appears at some LSN persists in every later event — so
  * the batch's max-LSN tail witnesses every column and type the batch
  * carries. The inference pass is therefore a cheap top-N by a single
  * extracted JSON field (TakeOrderedAndProject — no full-batch JSON
  * parse) plus schema inference over `sampleLines` lines, flat however
  * large the batch grows.
  *
  * Monotone PRESENCE, however, is not guaranteed by monotone drift:
  * JSON encoders that omit null-valued fields (Spark's own `to_json`
  * default, and hand-rolled producers) make field presence
  * value-dependent — a column live mid-batch whose tail rows happen to
  * be null would vanish from the sample, and its mid-batch values
  * would silently decode away. So the sample is VERIFIED against a
  * full-batch key-presence scan (`json_object_keys` — a thin codegen'd
  * pass aggregating to O(fields) distinct names, no type inference, no
  * schema merging): any field present anywhere in the batch that the
  * tail did not witness falls back to full-batch inference for that
  * batch — sound for both the field and its type, and rare by the
  * monotone-drift argument. What remains contractual is value
  * REPRESENTATION: a widened column whose tail values happen to encode
  * narrow (a double column emitting `7`, not `7.0`) is indistinguishable
  * from an unwidened one in any sample; real wire formats (Debezium
  * with schemas) encode per the declared type, and the promotion path
  * heals the table when the wide form surfaces.
  *
  * The seed covers the base schema ([[graft.model.SchemaBuilder
  * .buildFromColumns]] is the typed path at 100 TB/day — inference only
  * ever absorbs drift), and the registered schema is add-only so a
  * column once seen is never dropped. State is one StructType on the
  * driver — O(columns), never data. */
final class EvolvingDecoder(seed: StructType, sampleLines: Int = 1024) {
  @volatile private var registered: StructType = seed
  @volatile private var ver: Int = 1
  def payloadSchema: StructType = registered
  def version: Int = ver

  /** Decode one micro-batch, evolving the registered schema first. */
  def decode(raw: DataFrame, jsonCol: String): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val lines = raw.select(col(jsonCol).cast("string").as("line"))
    // malformed lines (null lsn) sort last under desc and fall out of
    // the sample; the decode path skips them the same way
    val tail = lines
      .orderBy(get_json_object(col("line"), "$.source.lsn").cast("long").desc)
      .limit(sampleLines)
      .as[String]
    def payloadFields(env: StructType): StructType = {
      def payloadOf(name: String): Seq[org.apache.spark.sql.types.StructField] =
        env.find(_.name == name).map(_.dataType) match {
          case Some(s: StructType) => s.fields.toSeq
          case _                   => Seq.empty
        }
      val after = payloadOf("after")
      val haveAfter = after.map(_.name).toSet
      StructType(
        after ++ payloadOf("before").filterNot(f => haveAfter.contains(f.name)))
    }
    val sampled = payloadFields(spark.read.json(tail).schema)
    // presence verification (see scaladoc): every key present ANYWHERE
    // in the batch must have been witnessed by the tail sample — a
    // null-omitting encoder can hide a live column from any sample
    val present = lines.select(explode(array_distinct(concat(
        coalesce(json_object_keys(get_json_object(col("line"), "$.after")),
          array()),
        coalesce(json_object_keys(get_json_object(col("line"), "$.before")),
          array())))).as("k"))
      .distinct().as[String].collect().toSet
    val incoming =
      if ((present -- sampled.fieldNames).isEmpty) sampled
      else payloadFields(spark.read.json(lines.as[String]).schema)
    val (added, _) = graft.model.SchemaBuilder.merge(registered, incoming, ver)
    // JSON-inference widening: a column that FIRST appeared with only
    // integral values infers long; a later batch carrying 10.5 would
    // decode to null under the frozen type (from_json PERMISSIVE) —
    // silent corruption. Promote along the numeric lattice instead
    // (int→long→double, float→double: Iceberg's promotion rules plus
    // JSON's long→double, which only ever arises from inference, never
    // from a declared source type). Existing fields otherwise keep
    // position and type, per the add-only contract.
    val incomingTypes = incoming.fields.map(f => f.name -> f.dataType).toMap
    import org.apache.spark.sql.types._
    val merged = StructType(added.fields.map { f =>
      (f.dataType, incomingTypes.get(f.name)) match {
        case (IntegerType, Some(LongType))   => f.copy(dataType = LongType)
        case (IntegerType, Some(DoubleType)) => f.copy(dataType = DoubleType)
        case (LongType, Some(DoubleType))    => f.copy(dataType = DoubleType)
        case (FloatType, Some(DoubleType))   => f.copy(dataType = DoubleType)
        case _                               => f
      }
    })
    if (merged != registered) ver += 1
    registered = merged
    EnvelopeDecoder.decode(raw, jsonCol, merged)
  }
}
