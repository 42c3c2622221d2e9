package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SumExpressions.sum128

/** Property tests for the native 128-bit sum aggregate: bit-exact equality
  * with the DECIMAL(38,0) reference sum under partials + merges, including
  * sums far past the 64-bit range and negative values.
  */
class Sum128Spec extends SparkSpec {

  private def check(values: Seq[Long], partitions: Int): Unit = {
    import spark.implicits._
    val df = values.toDF("v").repartition(partitions) // forces partial+merge
    val got = df.agg(sum128(col("v")).cast("string")).head.getString(0)
    val want = values.map(BigInt(_)).sum.toString
    assert(got == want, s"sum128 mismatch: $got != $want over ${values.take(5)}…")
  }

  test("matches BigInt over random longs across merge boundaries") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val vs = Seq.fill(200)(rnd.nextLong() / 2)
      check(vs, 7)
    }
  }

  test("sums far past the 64-bit range stay exact") {
    // 40 × (Long.MaxValue - small) ≈ 3.6e20 > 2^64; carries on every add
    val vs = (0 until 40).map(i => Long.MaxValue - i.toLong)
    check(vs, 5)
    check(vs.map(-_), 5) // negative mirror exercises sign-extension carries
    check(vs ++ vs.map(-_), 3) // cancellation back into the 64-bit range
  }

  test("mixed signs, zeros and nulls follow sum-skip-null semantics") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, null, -5L, 7L, null, 0L)
      .toDF("v").repartition(3)
    val got = df.agg(sum128(col("v")).cast("long")).head.getLong(0)
    assert(got == 3L)
  }

  test("grouped sums agree with the decimal reference sum per group") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => (i % 37, Long.MaxValue / 1000 * (if (i % 3 == 0) -1 else 1) + i))
    val df = rows.toDF("k", "v").repartition(11)
    val both = df.groupBy("k")
      .agg(sum128(col("v")).cast("string").as("s128"),
        sum(col("v").cast("decimal(38,0)")).cast("string").as("sdec"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(1) == r.getString(2), s"group ${r.get(0)}"))
  }

  test("empty and all-null inputs evaluate to NULL like SQL sum") {
    import spark.implicits._
    // Global .agg over a filtered-to-empty relation: DuckDB's sum(...) is
    // NULL there, and the previous sum(DECIMAL) formulation was too.
    val empty = (1L to 10L).toDF("v").filter(col("v") > 100)
    assert(empty.agg(sum128(col("v"))).head.isNullAt(0))
    val allNull = Seq[java.lang.Long](null, null).toDF("v").repartition(2)
    assert(allNull.agg(sum128(col("v"))).head.isNullAt(0))
    // …but a zero-sum over real rows is 0, not NULL
    val zeroSum = Seq(5L, -5L).toDF("v")
    assert(zeroSum.agg(sum128(col("v")).cast("long")).head.getLong(0) == 0L)
  }

  test("sum128Nanos(decimal9_nanos(v)) bit-identical to the decimal-cast sum") {
    import org.apache.spark.sql.graft.SumExpressions.{decimal9_nanos, sum128Nanos}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // float-derived doubles (the embedding domain) + exact-tie values
    // (odd multiples of 2^-10 land exactly on .5 at scale 9) + negatives
    val vs = Seq.fill(4000)(rnd.nextFloat() * 16 - 8).map(_.toDouble) ++
      Seq(1.0 / 1024, -1.0 / 1024, 3.0 / 1024, -3.0 / 1024, 0.0, -0.0)
    val df = vs.map(v => (rnd.nextInt(5), v)).toDF("k", "v").repartition(9)
    val both = df.groupBy("k")
      .agg(
        sum128Nanos(decimal9_nanos(col("v"))).cast("string").as("s128"),
        sum(col("v").cast("decimal(18,9)")).cast("decimal(38,9)").cast("string").as("sdec"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(1) == r.getString(2),
      s"group ${r.get(0)}: ${r.getString(1)} != ${r.getString(2)}"))
    // per-value check too: the unscaled long must equal the decimal cast
    val rows = vs.toDF("v")
      .select(decimal9_nanos(col("v")).as("n"),
        (col("v").cast("decimal(18,9)") * lit(1000000000L)).cast("long").as("d"))
      .filter(col("n") =!= col("d")).count()
    assert(rows == 0L)
  }

  test("q90's forced Sum128 escalation is output-identical to the long path") {
    // The >9.2e9-row corpus that AUTO-selects the wide accumulator can't
    // exist at test SF, so force it: both widths over the same embeddings
    // must agree cell-for-cell (i, j, n, s_n9) — the escalation changes
    // only the accumulator's intermediate exactness, never the value.
    val emb = Tables(spark, sf, "embeddings")
    val narrow = queries.VectorOps.q90MomentsPlan(emb, wide = false).collect()
    val wide = queries.VectorOps.q90MomentsPlan(emb, wide = true).collect()
    assert(narrow.nonEmpty)
    assert(narrow.length == wide.length)
    narrow.zip(wide).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // and the wide plan keeps the narrow plan's aggregate physicality
    // (r22: MomentCellsAgg — in-place MomentBuf ObjectHashAggregate,
    // partial+final, NO Generate fan-out; the d·(d+1)/2-term explode and
    // its per-term hash probes are gone. The aggregate cannot be inside
    // whole-stage codegen in ANY formulation — Spark 4.1 gates aggregate
    // codegen on UnsafeRow-mutable buffer types — so the pin here is the
    // shape; bit-equivalence to the explode twin is CodegenGuardSpec's.)
    val plan = queries.VectorOps.q90MomentsPlan(emb, wide = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_moment_cells"), plan)
    assert(!plan.contains("Generate explode(flatten"), plan)
  }

  test("registered as a SQL function and stays inside whole-stage codegen") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = (1L to 100L).toDF("v")
    df.createOrReplaceTempView("__s128")
    val viaSql = spark.sql("SELECT CAST(sum128(v) AS BIGINT) FROM __s128").head.getLong(0)
    assert(viaSql == 5050L)
    // the aggregate must run inside HashAggregate's codegen (primitive
    // two-long buffer), not the ObjectHashAggregate fallback
    val plan = df.agg(sum128(col("v"))).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}
