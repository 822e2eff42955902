package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for multi-consumer derived frames the query builders
  * persist (inverted indexes, token streams, PQ subvector frames).
  *
  * Spark's CacheManager dedupes a re-persist of the SAME canonical plan
  * to the one existing storage entry, so repeat invocations over one
  * corpus cost one copy — but DISTINCT corpora each leave a copy
  * behind, and a long-lived session should not lean on LRU eviction
  * alone. Builders register here; the session owner releases after the
  * consuming action ([[graft.Verify]] after its dump, a production
  * pipeline between corpora).
  */
object CachedFrames {
  private val frames =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Persist MEMORY_AND_DISK (spill, don't recompute) and track for
    * [[releaseAll]].
    */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    frames.add(p)
    p
  }

  /** Unpersist every tracked frame and clear the registry. BLOCKING by
    * design: an async unpersist races with the next consumer's persist
    * of the same canonical plan — the CacheManager dedupes onto the
    * dying entry, whose blocks are concurrently vanishing, so the next
    * "warm" read silently recomputes. (Observed as run-order-dependent
    * cold first samples in the bench before this was made blocking.)
    */
  def releaseAll(): Unit = {
    val it = frames.iterator()
    while (it.hasNext) { it.next().unpersist(blocking = true); it.remove() }
  }
}
