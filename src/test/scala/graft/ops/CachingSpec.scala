package graft.ops

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Pins [[Caching.scoped]]'s release contract (r10 verdict note:
  * cacheOnce'd intermediates accumulate across a long session). */
class CachingSpec extends SparkSpec {
  import spark.implicits._

  test("scoped releases frames first cached inside it; pre-cached " +
    "and outer-scope frames survive") {
    val pre = Seq(1, 2, 3).toDF("a")
    Caching.cacheOnce(pre).count()
    assert(pre.storageLevel != StorageLevel.NONE)

    val outer = Seq(4, 5).toDF("b")
    val inner = Seq(6, 7).toDF("c")
    Caching.scoped {
      Caching.cacheOnce(outer).count()
      Caching.scoped {
        Caching.cacheOnce(inner).count()
        // cacheOnce on an ALREADY-cached frame must not adopt it
        // into this scope
        Caching.cacheOnce(pre).count()
        assert(inner.storageLevel != StorageLevel.NONE)
      }
      // inner scope released its own frame only
      assert(inner.storageLevel == StorageLevel.NONE)
      assert(outer.storageLevel != StorageLevel.NONE)
      assert(pre.storageLevel != StorageLevel.NONE)
    }
    assert(outer.storageLevel == StorageLevel.NONE)
    assert(pre.storageLevel != StorageLevel.NONE)
    pre.unpersist(blocking = false)
  }

  test("scoped releases on failure too") {
    val df = Seq(9).toDF("d")
    intercept[RuntimeException] {
      Caching.scoped {
        Caching.cacheOnce(df).count()
        throw new RuntimeException("boom")
      }
    }
    assert(df.storageLevel == StorageLevel.NONE)
  }
}
