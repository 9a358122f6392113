package graft

/** Atomic fill for the extension modules' keyed caches.
  *
  * `TrieMap.getOrElseUpdate` may evaluate its thunk on several threads
  * and keep only one result. For plain values that just wastes work —
  * but most of these thunks `persist()` a DataFrame (or run a whole
  * training / contraction pass): every losing thread's persist
  * registration stays behind in Spark's CacheManager, where the
  * module's `invalidateCaches()` (which unpersists map VALUES) can
  * never release it — a storage leak for the session's lifetime,
  * reachable whenever two registered queries sharing a cache key run
  * concurrently (Verify's pool, the plan-gate spec, any embedder).
  *
  * Fill under one lock per cache with a lock-free first read, so warm
  * lookups cost a TrieMap get and only cold fills serialize — the
  * [[graft.queries.Lifecycle.FixtureCache]] discipline, generalized.
  * Unrelated caches keep building in parallel (each map is its own
  * lock).
  */
object CacheFill {
  def apply[K, V](m: scala.collection.concurrent.TrieMap[K, V], k: K)(
      build: => V): V =
    m.get(k).getOrElse(m.synchronized {
      m.getOrElseUpdate(k, build)
    })
}
