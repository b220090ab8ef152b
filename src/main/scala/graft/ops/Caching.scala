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
  def cacheOnce(df: DataFrame): DataFrame = cacheOnceTracked(df)._1

  /** [[cacheOnce]] plus whether THIS call did the caching — so a
    * compile step that caches a training frame for its own multiple
    * driver actions can unpersist it afterwards without clobbering a
    * cache its caller registered first (r11 advice: compile-scoped
    * caches otherwise accumulate across stage assemblies in
    * long-lived sessions). */
  def cacheOnceTracked(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel == StorageLevel.NONE) {
      val cached = df.cache()
      // a frame first cached inside an open scope belongs to that
      // scope; already-cached frames no-op above and never enter it
      ledger.get().lastOption.foreach(_ += cached)
      (cached, true)
    } else (df, false)

  /** Scoped release for a RESIDENT service embedding these operators
    * (r10 verdict note: cacheOnce'd shingle/pass tables accumulate
    * across a long session — harmless under the bench, where Spark's
    * MEMORY_AND_DISK LRU evicts, but a long-lived host may want the
    * storage back deterministically). Unpersists every frame FIRST
    * cached through [[cacheOnce]] during `body` (same thread),
    * including on failure; frames cached before the scope are left
    * alone. Scopes nest — each releases only its own frames. */
  def scoped[T](body: => T): T = {
    val mine = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    ledger.get() += mine
    try body
    finally {
      ledger.get() -= mine
      mine.foreach(_.unpersist(blocking = false))
    }
  }

  private val ledger = ThreadLocal.withInitial[
    scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[DataFrame]]](
    () => scala.collection.mutable.ArrayBuffer.empty)
}
