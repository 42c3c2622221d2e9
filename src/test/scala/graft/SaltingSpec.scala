package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._

/** End-to-end skew-salting proof on the band-join shape q39 uses: a
  * candidate self-join keyed on a signature band key, with ONE hot key
  * covering 20% of the docs (the skew profile a stopword-like band key
  * produces at scale). The salted join must return exactly the plain
  * join's rows while the hot key's shuffle work spreads across saltN
  * reducer buckets instead of one.
  */
class SaltingSpec extends SparkSpec {

  private val SaltN = 8
  private val N = 2000

  // (doc id, band key): key 0 is hot — every 5th doc (20%, 400 rows);
  // the rest spread over 400 cold keys (~4 rows each)
  private lazy val docs = {
    import spark.implicits._
    (0 until N).map { i =>
      (i.toLong, if (i % 5 == 0) 0L else 1L + (i % 400))
    }.toDF("doc_id", "bk")
  }

  test("saltedJoin: row-identical to the plain band join under a 20% hot key") {
    val a = docs.select(col("doc_id").as("id_a"), col("bk"))
    val b = docs.select(col("doc_id").as("id_b"), col("bk"))
    val plain = a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("bk", "id_a", "id_b")
    val salted = Salting.saltedJoin(a, b, "bk", SaltN)
      .filter(col("id_a") < col("id_b"))
      .select("bk", "id_a", "id_b")
    val nPlain = plain.count()
    assert(nPlain > 0)
    assert(salted.count() == nPlain)
    // exact multiset equality (rows are distinct by construction, so
    // two-sided EXCEPT is a full multiset check here)
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("scatter: the hot key's rows spread across all saltN buckets") {
    val hot = docs.filter(col("bk") === 0L)
      .withColumn("s", Salting.scatter(col("bk"), SaltN))
      .groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // all SaltN buckets occupied, none holding the whole 400-row key —
    // i.e. the single hot reducer genuinely became SaltN smaller ones
    assert(hot.keySet == (0 until SaltN).toSet, s"buckets: $hot")
    val sizes = hot.values
    assert(sizes.sum == 400)
    assert(sizes.max < 400 && sizes.max <= 3 * 400 / SaltN,
      s"scatter is too skewed: $hot")
  }

  test("salted plan shuffles on (key, salt); salted agg merges to plain totals") {
    val a = docs.select(col("doc_id").as("id_a"), col("bk"))
    val b = docs.select(col("doc_id").as("id_b"), col("bk"))
    val salted = Salting.saltedJoin(a, b, "bk", SaltN)
    val plan = salted.queryExecution.executedPlan.toString
    // the shuffle key is the composite (bk, __salt) — that IS the skew fix
    assert(plan.contains("__salt"), plan.take(600))
    // two-level aggregation: per-(key,salt) partials then per-key merge
    val agg = Salting.saltedAgg(docs, "bk", SaltN,
      partials = Seq(count(lit(1)).as("c")),
      merge = Seq(sum(col("c")).as("n")))
    val direct = docs.groupBy("bk").agg(count(lit(1)).as("n"))
    assert(agg.join(direct, Seq("bk"))
      .filter(agg("n") =!= direct("n")).count() == 0)
    assert(agg.count() == direct.count())
  }
}
