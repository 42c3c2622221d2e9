package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Driver-memo lifecycle pins (SessionMemo): superseded stamps evict on
  * insert (the r18 ADVICE slow-leak finding — each re-ingest retained
  * another materialized model), explicit session eviction drops exactly
  * that session's entries, and clearAll leaves LIVE-session memos alone
  * (they exist to make model loads zero-job after first touch).
  */
class MemoHygieneSpec extends SparkSpec {

  test("re-stamping a source evicts the superseded memo entries instead of accumulating them") {
    val dir = Files.createTempDirectory("graft-memo-hygiene").toString
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      Paths.get(s"$dir/documents.parquet"), StandardCopyOption.REPLACE_EXISTING)

    sources.CorpusStats.rowCount(spark, dir, "documents")
    val afterFirst = sources.SessionMemo.entryCount(spark)

    // new stamp: same bytes, bumped mtime (layout stamps are size+mtime)
    val f = Paths.get(s"$dir/documents.parquet")
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      Files.getLastModifiedTime(f).toMillis + 5000))
    sources.CorpusStats.rowCount(spark, dir, "documents")
    val afterSecond = sources.SessionMemo.entryCount(spark)

    assert(afterSecond == afterFirst,
      s"superseded-stamp entries must be evicted on insert: $afterFirst -> $afterSecond")
  }

  test("evictSession drops one session's memos and leaves the other's") {
    val child = spark.newSession()
    Tables(child, sf, "region").count()
    val parentBefore = sources.SessionMemo.entryCount(spark)
    assert(sources.SessionMemo.entryCount(child) > 0)

    Caches.evictSession(child)
    assert(sources.SessionMemo.entryCount(child) == 0,
      "evicted session must hold zero tracked memo entries")
    assert(sources.SessionMemo.entryCount(spark) == parentBefore,
      "evicting one session must not touch another's memos")
  }

  test("cachedStamped prefix eviction never crosses layout families (distinct sourceKey)") {
    // The eviction rule drops superseded stamps of the same
    // (version, kind, source) ONLY: two different corpora are different
    // families and must never evict each other, even when every other
    // path segment matches.
    val map = sources.SessionMemo.track(
      scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), Int])(_._1)
    def path(src: String, stamp: String) = s"/tmp/graft-layout/v9-kindX-$src-$stamp"
    sources.SessionMemo.cachedStamped(map, spark, path("srcAAAA", "stamp1"))(1)
    sources.SessionMemo.cachedStamped(map, spark, path("srcBBBB", "stamp1"))(2)
    // re-stamp family A: A's old stamp goes, B's entry must survive
    sources.SessionMemo.cachedStamped(map, spark, path("srcAAAA", "stamp2"))(3)
    assert(!map.contains((spark, path("srcAAAA", "stamp1"))),
      "superseded same-family stamp must be evicted")
    assert(map.contains((spark, path("srcBBBB", "stamp1"))),
      "a DIFFERENT source's entry must never be evicted by another family's insert")
    assert(map((spark, path("srcBBBB", "stamp1"))) == 2,
      "the other family's value must be untouched")
  }

  test("cachedStamped survives concurrent inserts (registry CopyOnWriteArrayList + TrieMap race)") {
    // 16 threads insert distinct stamps of ONE family while 16 more
    // track fresh maps (registry writes) — no exception may escape, and
    // a final insert must converge the family to exactly its own entry.
    val map = sources.SessionMemo.track(
      scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), Int])(_._1)
    def path(stamp: String) = s"/tmp/graft-layout/v9-kindY-srcCCCC-$stamp"
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 16).map { i =>
      new Thread(() => {
        try {
          sources.SessionMemo.cachedStamped(map, spark, path(s"s$i"))(i)
          // concurrent registry writes (the CopyOnWriteArrayList leg)
          sources.SessionMemo.track(scala.collection.concurrent.TrieMap
            .empty[(org.apache.spark.sql.SparkSession, String), Int])(_._1)
        } catch { case _: Throwable => errs.incrementAndGet() }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.get() == 0, "no concurrent insert may throw")
    sources.SessionMemo.cachedStamped(map, spark, path("sFinal"))(99)
    val family = map.keysIterator.filter(_._2.contains("kindY-srcCCCC")).toList
    assert(family == List((spark, path("sFinal"))),
      s"after the final insert exactly one family entry must remain, got $family")
    assert(map((spark, path("sFinal"))) == 99)
  }

  test("clearAll keeps live-session memos (zero-job reload is the point of the memo)") {
    sources.BigramLm.model(spark, sf)
    val before = sources.SessionMemo.entryCount(spark)
    assert(before > 0)
    Caches.clearAll(spark)
    assert(sources.SessionMemo.entryCount(spark) == before,
      "clearAll purges STOPPED sessions only; live memos must survive")
  }
}
