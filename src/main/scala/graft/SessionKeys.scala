package graft

import org.apache.spark.sql.SparkSession

/** Stable per-session cache key. The per-session caches (scaled vectors,
  * trained quantizers, LSH signatures) used to key on
  * `System.identityHashCode(session)`, but an identity hash can be reused
  * by a LATER SparkSession allocated after the first is collected — a
  * collision would serve one session's trained model for another's corpus.
  * A WeakHashMap assigns each live session a UUID exactly once and lets
  * the entry (and so the key) die with the session, ruling the collision
  * out by construction.
  */
object SessionKeys {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def apply(s: SparkSession): String =
    ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)
}
