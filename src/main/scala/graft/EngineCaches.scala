package graft

/** Central release point for the per-(session, dir) persisted-DataFrame
  * caches the extension modules keep (signature sets, scaled vectors,
  * verified pair sets). The bench/verify binaries let process exit clean
  * them up; a long-lived engine embedding this library calls
  * [[invalidateAll]] between workloads to bound executor storage memory.
  */
object EngineCaches {
  def invalidateAll(): Unit = {
    extensions.Dedup.invalidateCaches()
    extensions.Similarity.invalidateCaches()
    extensions.Pq.invalidateCaches()
    extensions.TextAnalysis.invalidateCaches()
    extensions.Multimodal.invalidateCaches()
  }
}
