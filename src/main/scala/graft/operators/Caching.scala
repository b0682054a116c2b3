package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** `persist()` that tolerates re-entry: a bench rep rebuilds the same
  * logical plan, and a second `.persist()` on an already-registered plan
  * logs a CacheManager warning per call; checking the storage level first
  * (a CacheManager lookup by plan) reuses the existing entry silently.
  */
private[graft] object Caching {
  def cacheOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}
