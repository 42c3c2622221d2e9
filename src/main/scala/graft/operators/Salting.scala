package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations (SURVEY §4 scale
  * guidance — the technique AQE's skew-join handles reactively, provided
  * here as an explicit operator for when the skew is KNOWN: a hot user_id,
  * a null-heavy foreign key, a stopword-like join key).
  *
  * A plain equi-join hashes every row of a hot key to ONE reducer; at
  * 100 TB a single key holding 1% of the table serializes 1 TB through
  * one task. Salting splits each hot key across `saltN` buckets: the big
  * side scatters uniformly (a per-row deterministic bucket), the small
  * side replicates `saltN`× — the shuffle key becomes (key, salt) and the
  * hot key's work lands on `saltN` reducers. The cost is replicating the
  * small side, which is why this composes with (and does not replace)
  * `broadcast()` — salt when the small side is too big to broadcast AND a
  * key is hot.
  *
  * Measured (SaltingSpec, band-join shape of q39 with one key covering 20%
  * of 2000 docs): the salted join's shuffle keys on the composite
  * (key, __salt) — visible in the executed plan's hashpartitioning — the
  * 400-row hot key spreads across all 8 salt buckets (max bucket ≤ 1.5×
  * ideal), and the output is row-identical to the unsalted join. q39
  * itself does not pre-salt: its 3-block Manku keys are ~16-bit and
  * signature clustering already collapses the exact-dup storms that make
  * band keys hot, and AQE skew-join covers residual imbalance reactively;
  * this operator is the explicit fix for KNOWN skew the clustering cannot
  * absorb (e.g. a boilerplate near-dup family sharing one band key).
  */
object Salting {

  /** Per-row scatter bucket in [0, saltN): deterministic given the row's
    * join key and position, uniform across a hot key's rows. The exact
    * assignment does not affect the join OUTPUT (any scatter yields the
    * same joined rows), only the shuffle balance. `private[graft]` so
    * SaltingSpec can measure the spread it produces.
    */
  private[graft] def scatter(key: Column, saltN: Int): Column =
    pmod(hash(key, spark_partition_id(), monotonically_increasing_id()), lit(saltN))

  /** Skew-safe inner equi-join on `key`: big side scattered across saltN
    * buckets, small side replicated saltN times; joins on (key, salt).
    * Result rows equal `big.join(small, key)` exactly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltN: Int): DataFrame = {
    require(saltN >= 1, s"saltN must be >= 1, got $saltN")
    val bigS = big.withColumn("__salt", scatter(col(key), saltN))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe aggregation: two-level reduce for algebraic aggregates —
    * partial-aggregate on (key, salt), final-aggregate on key. Spark's
    * hash aggregate already does map-side partials, but a hot key still
    * funnels every partial to one reducer; the salted first level spreads
    * the REDUCE of the hot key across saltN tasks. `partials` aggregates
    * one (key, salt) group; `merge` combines the salted partials per key
    * (they must form the same algebra, e.g. sum→sum, count→sum, min→min).
    */
  def saltedAgg(df: DataFrame, key: String, saltN: Int,
      partials: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", scatter(col(key), saltN))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}
