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
  * Locking is two-level so the fix costs no parallelism:
  *  - one lock PER (cache, key) serializes duplicate builds of the
  *    same entry (a losing duplicate contraction/training pass is the
  *    expensive waste the old coarse lock prevented) while UNRELATED
  *    keys of the same cache still build concurrently;
  *  - the INSERT happens under the map's own monitor, which the
  *    module's `invalidateCaches()` also takes around its
  *    unpersist+clear — so a fill completing mid-invalidate either
  *    lands before the clear (and is unpersisted by it) or after (and
  *    stays keyed for the next invalidate); no frame can be dropped
  *    from the map without a matching unpersist.
  * Warm lookups stay lock-free. Lock objects are never evicted: the
  * set of (cache, key) pairs is session-bounded and tiny, and evicting
  * one while a builder holds it would only cost a duplicate build,
  * never correctness (the monitor-guarded insert stays authoritative).
  *
  * Lock identity is by cache-map REFERENCE, not value: a mutable map's
  * structural `hashCode`/`equals` change with its contents (and two
  * empty caches compare equal), so a `(m, k)` tuple key registered
  * while `m` was empty becomes unreachable the moment any fill lands in
  * `m` — two threads cold-filling the SAME key could then hold
  * DIFFERENT locks and run duplicate builds, whose losing `persist()`
  * the invalidate sweep can never release (the exact leak this class
  * exists to close). [[LockKey]] pins the map component to
  * `eq`/`System.identityHashCode` semantics, stable under mutation.
  */
object CacheFill {
  private final class LockKey(val m: AnyRef, val k: Any) {
    override def hashCode: Int =
      System.identityHashCode(m) * 31 + (if (k == null) 0 else k.hashCode)
    override def equals(o: Any): Boolean = o match {
      case other: LockKey => (other.m eq m) && other.k == k
      case _              => false
    }
  }

  private val locks =
    scala.collection.concurrent.TrieMap.empty[LockKey, AnyRef]

  def apply[K, V](m: scala.collection.concurrent.TrieMap[K, V], k: K)(
      build: => V): V =
    m.get(k).getOrElse {
      val lock = locks.getOrElseUpdate(new LockKey(m, k), new Object)
      lock.synchronized {
        m.get(k).getOrElse {
          val v = build
          m.synchronized(m.getOrElseUpdate(k, v))
        }
      }
    }

  /** The invalidation side of the contract: unpersist+clear under the
    * map's monitor so no concurrent fill's insert can slip between the
    * value sweep and the clear (which would orphan its persist). */
  def invalidate[K, V](m: scala.collection.concurrent.TrieMap[K, V])(
      release: V => Unit): Unit =
    m.synchronized {
      m.values.foreach(release)
      m.clear()
    }
}
