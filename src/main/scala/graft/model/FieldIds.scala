package graft.model

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Iceberg-style stable FIELD IDS (ref internal/iceberg/types.go:27-51 —
  * the `id` every NestedField carries): each column owns an id for life,
  * recorded in the StructField metadata the manifest schema json
  * round-trips. Ids are what make rename a METADATA-ONLY operation
  * (same id, new name — old files resolve by id) and drop safe against
  * re-add (a re-added name takes a FRESH id, so a dropped column's bytes
  * in old files can never leak back into the new column). The table's
  * `last_column_id` high-water mark lives in the manifest header and
  * never decreases, exactly Iceberg's rule. */
object FieldIds {

  val Key = "graft.fid"

  def idOf(f: StructField): Option[Int] =
    if (f.metadata.contains(Key)) Some(f.metadata.getLong(Key).toInt) else None

  def withId(f: StructField, id: Int): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(Key, id.toLong).build())

  def hasIds(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(_.metadata.contains(Key))

  /** Stamp ordinal ids 1..n onto a pre-field-id schema (the lazy
    * migration for legacy manifests). */
  def stamp(schema: StructType): (StructType, Int) =
    (StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      withId(f, i + 1)
    }), schema.fields.length)

  /** Reconcile an incoming write schema against the parent's: fields
    * matching a parent field BY NAME inherit its id (the incoming type
    * wins — type promotion flows through), unmatched incoming fields get
    * fresh ids above `parentLastId`. Name-matching is the right rule for
    * the generic commit path because writers align frames to the stored
    * schema by name; RENAME deliberately bypasses this (a rename looks
    * like drop+add by name) and pre-reconciles its schema itself. */
  def reconcile(parent: StructType, parentLastId: Int,
                incoming: StructType): (StructType, Int) = {
    val byName = parent.fields.flatMap(f => idOf(f).map(f.name -> _)).toMap
    var last = parentLastId
    val out = incoming.fields.map { f =>
      byName.get(f.name) match {
        case Some(id) => withId(f, id)
        case None     => last += 1; withId(f, last)
      }
    }
    (StructType(out), last)
  }

  /** True iff files written under `ws` may read directly BY NAME under
    * `target` — the fast-path test that skips per-id projection. Safe
    * iff, for every target field, name-resolution and id-resolution
    * against `ws` agree: both absent (plain added column → null), or
    * both the same field. A name match with a DIFFERENT id (drop +
    * re-add: the old bytes must not leak) or an id living under another
    * name (rename: the bytes must follow the id) forces the id path. */
  def byNameSafe(ws: StructType, target: StructType): Boolean =
    target.fields.forall { tf =>
      val byName = ws.fields.find(_.name == tf.name)
      val byId = idOf(tf).flatMap(fieldById(ws, _))
      (byName, byId) match {
        case (None, None) => true
        case (Some(a), Some(b)) => a.name == b.name && idOf(a) == idOf(b)
        case (Some(_), None) if idOf(tf).isEmpty => true // legacy target
        case _ => false
      }
    }

  /** The field of `schema` owning `id`, if any. */
  def fieldById(schema: StructType, id: Int): Option[StructField] =
    schema.fields.find(f => idOf(f).contains(id))
}
