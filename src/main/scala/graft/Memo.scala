package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-dir memoization of session-cached base relations (the shared-base
  * discipline: one fact scan feeds many registered queries). The wrinkle
  * this helper exists for: a global `clearCache()` (tests do this to get
  * clean plan shapes) unpersists the underlying entry while the memo map
  * still holds the DataFrame — every later consumer would silently
  * re-derive the base INLINE in its own plan, per use. Re-caching a dropped
  * entry on access restores the share.
  */
object Memo {
  def cached(
      map: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      key: String)(build: String => DataFrame): DataFrame = {
    val df = map.computeIfAbsent(key, k => build(k).cache())
    if (df.storageLevel == StorageLevel.NONE) df.cache()
    df
  }
}
