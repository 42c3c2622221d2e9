package graft

import org.apache.spark.storage.StorageLevel

/** The scoped cache-release contract behind curate jobs in shared sessions
  * (JobRunner uses snapshot + clearCreatedSince so a job evicts only its
  * own persists): a persist taken BEFORE the snapshot survives, one taken
  * AFTER is released. Suites share the session and other suites call
  * clearAll concurrently, which can only evict MORE — so the
  * released-side assert is deterministic, and the survives-side assert
  * retries to step around a concurrent clearAll.
  */
class CachesSpec extends SparkSpec {

  test("clearCreatedSince releases post-snapshot persists, spares prior ones") {
    def attempt(): Boolean = {
      val sc = spark.sparkContext
      val a = sc.parallelize(1 to 4).persist(StorageLevel.DISK_ONLY)
      a.count()
      val before = Caches.snapshot(spark)
      val b = sc.parallelize(1 to 4).persist(StorageLevel.DISK_ONLY)
      b.count()
      Caches.clearCreatedSince(spark, before)
      // deterministic: nothing in the session re-persists b, so survival
      // here can only mean clearCreatedSince skipped it
      assert(b.getStorageLevel == StorageLevel.NONE,
        "clearCreatedSince did not release a post-snapshot persist")
      val aSurvived = sc.getPersistentRDDs.contains(a.id)
      a.unpersist(blocking = true)
      aSurvived
    }
    // a concurrent suite's clearAll can evict `a` from outside — retry;
    // five consecutive evictions of a millisecond-wide window means the
    // function itself is clearing pre-snapshot ids
    assert((1 to 5).exists(_ => attempt()),
      "pre-snapshot cache evicted in 5/5 attempts — scoped release broken")
  }
}
