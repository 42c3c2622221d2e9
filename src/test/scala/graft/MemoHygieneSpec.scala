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

  test("clearAll keeps live-session memos (zero-job reload is the point of the memo)") {
    sources.BigramLm.model(spark, sf)
    val before = sources.SessionMemo.entryCount(spark)
    assert(before > 0)
    Caches.clearAll(spark)
    assert(sources.SessionMemo.entryCount(spark) == before,
      "clearAll purges STOPPED sessions only; live memos must survive")
  }
}
