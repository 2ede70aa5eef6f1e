package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Multi-consumer materialization cut for query-internal intermediates —
  * the resilient replacement for `localCheckpoint(false)` (r16, verdict
  * r15 #3): `persist(MEMORY_AND_DISK)` keeps lineage, so on a real
  * cluster an executor loss mid-query recomputes the lost partitions
  * instead of failing the job (localCheckpoint truncates lineage and the
  * bench tail WARNed about it).
  *
  * The unpersist-first twist is what keeps the swap HONEST under the
  * bench's rep discipline: Spark's CacheManager matches cache entries by
  * canonicalized PLAN, so a fresh construction of the same query would
  * silently reuse the previous rep's cached intermediate ("Asked to cache
  * already cached data") — timed reps would then measure a cache read,
  * not the computation, which is exactly the cross-run result caching the
  * bench bans. Dropping any stale entry for this plan before registering
  * the new one makes every construction recompute from the inputs, while
  * the cut still serves all consumers within one execution from one
  * materialization. (localCheckpoint never had the problem — RDD-level
  * state is per-construction — which this preserves at plan level.)
  */
object FreshPersist {
  def apply(df: DataFrame): DataFrame = {
    df.unpersist(blocking = false)
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }
}
