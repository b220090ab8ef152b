package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** `cache()` that no-ops when the same logical plan is already
  * registered (`Dataset.storageLevel` is a plan-keyed CacheManager
  * lookup, not an object property). Operators that cache an
  * intermediate frame get re-invoked with identical plans inside one
  * session — the bench loop, repeated notebook cells — and a bare
  * `.cache()` then re-registers and logs "Asked to cache already
  * cached data" on every run. */
private[graft] object Caching {
  def cacheOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
