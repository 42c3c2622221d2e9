package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Central hygiene for the session-keyed driver memos ([[DerivedLayout]]'s
  * plan handles, the collected model artifacts — [[BigramLm]],
  * [[CorpusStats]], [[IvfCentroids]], [[PqCodebooks]], [[BpeMerges]] — and
  * [[graft.Tables]]' plan-fragment cache). Each memo registers itself via
  * [[track]]; this object then owns the two lifecycle rules the individual
  * maps can't express alone:
  *
  *   - STAMP SUPERSESSION ([[cachedStamped]]): layout paths end in a
  *     source-fingerprint stamp (`<version>-<kind>-<sourceKey>-<stampKey>`,
  *     [[DerivedLayout.layoutPath]]). When a new stamp of the same
  *     (kind, source) is inserted, the superseded entries are dropped —
  *     without this, every ingest round in a long-lived session retained
  *     another materialized model (a (V+1)²-long bigram table per round —
  *     the r18 ADVICE leak).
  *   - SESSION EVICTION ([[evictSession]] / [[purgeStopped]]): a service
  *     embedding closes sessions; their memo entries must not outlive them.
  *     `purgeStopped` is safe to call anywhere (it only touches sessions
  *     whose SparkContext is stopped) and [[graft.Caches.clearAll]] — the
  *     hook every runner already calls — invokes it; `evictSession` is the
  *     explicit on-close hook for embedders.
  *
  * Entries are driver-side metadata/model values (no RDDs, no executors),
  * so eviction is pure map removal — re-reading after eviction costs one
  * tiny parquet read, never recomputation (the layouts stay on disk).
  */
private[graft] object SessionMemo {

  private final case class Tracked(
      evict: (SparkSession => Boolean) => Unit,
      count: SparkSession => Int)

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Tracked]()

  /** Register a session-keyed memo map; returns it for inline val init. */
  def track[K, V](map: TrieMap[K, V])(session: K => SparkSession): TrieMap[K, V] = {
    registry.add(Tracked(
      pred => map.keysIterator.toList
        .foreach(k => if (pred(session(k))) map.remove(k)),
      s => map.keysIterator.count(k => session(k) eq s)))
    map
  }

  /** getOrElseUpdate for stamped-path-keyed memos, evicting superseded
    * stamps of the same (version, kind, source) on insert: the path's
    * final '-' segment is the stamp key, everything before it identifies
    * the layout family ([[DerivedLayout.pruneStaleSiblings]]'s prefix
    * rule, applied to the in-memory map).
    */
  def cachedStamped[V](map: TrieMap[(SparkSession, String), V],
      spark: SparkSession, target: String)(v: => V): V =
    map.getOrElseUpdate((spark, target), {
      val prefix = target.take(target.lastIndexOf('-') + 1)
      map.keysIterator.toList.foreach { case k @ (s, p) =>
        if ((s eq spark) && p != target && p.startsWith(prefix)) map.remove(k)
      }
      v
    })

  /** Drop every tracked entry belonging to `spark` — the explicit
    * session-close hook.
    */
  def evictSession(spark: SparkSession): Unit =
    registry.forEach(t => t.evict(_ eq spark))

  /** Drop entries of any session whose SparkContext has stopped — dead
    * sessions can never read their memos again, so this is always safe.
    */
  def purgeStopped(): Unit =
    registry.forEach(t => t.evict(s =>
      try s.sparkContext.isStopped catch { case _: Throwable => true }))

  /** Tracked-entry count for one session (spec observability). */
  def entryCount(spark: SparkSession): Int = {
    var n = 0
    registry.forEach(t => n += t.count(spark))
    n
  }
}
