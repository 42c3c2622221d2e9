package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ImageExpressions, JsonExpressions, RegexScrub, SketchExpressions, SumExpressions, VectorExpressions}

/** Whole-stage-codegen COMPILE guard for every scalar native expression.
  *
  * Round-12 lesson: `pcm_window_stats` generated Java that Janino could not
  * compile (the companion's `eval(byte[], int)` had no static forwarder
  * because `BinaryExpression.eval(InternalRow)` shadows the name), and Spark
  * fell back to interpreted execution for the WHOLE stage — results stayed
  * correct, the plan string still showed the expression, and no test
  * noticed. The plan-string assertions in PlanSpec cannot catch this class
  * of defect: the plan prints identically whether the generated class
  * compiled or not.
  *
  * This guard actually compiles the generated source: `debug.codegenStringSeq`
  * runs `CodeGenerator.compile` on every WholeStageCodegen subtree and
  * reports `ByteCodeStats.UNAVAILABLE` (maxMethodCodeSize == -1) when Janino
  * rejects it. Every registered scalar expression is exercised in a map-only
  * projection and must (a) appear inside a compiled subtree's source and
  * (b) leave no subtree uncompilable.
  */
class CodegenGuardSpec extends SparkSpec {

  private def compiledSources(df: DataFrame): Seq[String] = {
    val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
      df.queryExecution.executedPlan)
    assert(subtrees.nonEmpty,
      "no WholeStageCodegen subtree in the plan — expression fell out of codegen:\n" +
        df.queryExecution.executedPlan.toString.take(1200))
    subtrees.foreach { case (name, _, stats) =>
      assert(stats.maxMethodCodeSize >= 0,
        s"generated Java FAILED to compile (interpreted fallback) in subtree:\n$name")
    }
    subtrees.map(_._2)
  }

  private def assertCodegen(df: DataFrame, kernels: String*): Unit = {
    val sources = compiledSources(df)
    kernels.foreach { k =>
      assert(sources.exists(_.contains(k)),
        s"kernel call `$k` not found in any COMPILED codegen source — " +
          "the expression is running interpreted")
    }
  }

  // parquet-backed so ConvertToLocalRelation can't constant-fold the
  // projection away (a LocalTableScan plan has no codegen stage to compile)
  private lazy val base: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet").limit(2)
      .withColumn("d", col("n_chars").cast("double") / 1000.0)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("emb", array((0 until 8).map(i => (lit(i) * col("d")).cast("float")): _*))
      .withColumn("json", concat(lit("{\"k\":"), col("doc_id"), lit("}")))

  test("text/sketch expressions: generated stage compiles") {
    import org.apache.spark.sql.graft.TextExpressions._
    val df = base.select(
      tokenize(col("text")).as("tk"),
      ws_token_count(col("text")).as("ws"),
      bpeish_token_count(col("text")).as("bp"),
      token_length_sum(col("toks")).as("tl"),
      tokens_in_set(col("toks"), Seq("the", "my")).as("ts"),
      tf_counts(col("toks"), array(lit("the"), lit("fox"))).as("tf"),
      ngram_hashes(col("toks"), 3).as("sh"),
      SketchExpressions.rolling_hash(col("text")).as("rh"),
      SketchExpressions.simhash32(SketchExpressions.token_hashes(col("toks"))).as("s32"),
      SketchExpressions.minhash_signature(
        SketchExpressions.token_hashes(col("toks")),
        Seq(3L, 5L), Seq(7L, 11L), 2147483647L).as("mh"))
    assertCodegen(df,
      "ExprKernels.tokenize", "ExprKernels.tokenHashes", "ExprKernels.wsTokenCount",
      "ExprKernels.bpeishTokenCount", "ExprKernels.tokenLengthSum",
      "ExprKernels.tokensInSet", "ExprKernels.tfCounts", "ExprKernels.shingleHashes",
      "ExprKernels.rollingHash", "ExprKernels.simhash", "ExprKernels.minhash")
  }

  test("bucket_counts: generated stage compiles and counts exactly") {
    // row-dependent input — an all-literal array constant-folds the whole
    // expression away at plan time and nothing reaches codegen
    val df = base.select(col("doc_id"),
      SketchExpressions.bucket_counts(
        array(lit(5L), lit(69L), pmod(col("doc_id"), lit(64L))), 64).as("bc"))
    assertCodegen(df, "ExprKernels.bucketCounts")
    df.collect().foreach { r =>
      val bc = r.getSeq[Long](1)
      assert(bc.length == 64 && bc.sum == 3L && bc(5) >= 2L)
      assert(bc((r.getLong(0) % 64).toInt) >= 1L)
    }
  }

  test("dup_run_stats: generated stage compiles and matches hand-computed runs") {
    // row-dependent input so nothing constant-folds; multiplicities by
    // hand: [7,7,7,x,5,5,9] with x = doc_id-dependent — top=3 (the 7s),
    // dup = 3 + 2 (+2 more if x collides with 5, impossible: x ≥ 10)
    val df = base.select(col("doc_id"),
      SketchExpressions.dup_run_stats(
        array(lit(7L), lit(7L), lit(7L), pmod(col("doc_id"), lit(64L)) + 10L,
          lit(5L), lit(5L), lit(9L))).as("rs"))
    assertCodegen(df, "ExprKernels.dupRunStats")
    df.collect().foreach { r =>
      val rs = r.getSeq[Long](1)
      assert(rs == Seq(3L, 5L), s"doc ${r.getLong(0)}: $rs")
    }
    // empty input → [0, 0]; registered as a SQL function
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    base.limit(1).createOrReplaceTempView("__drs")
    val e = spark.sql(
      "SELECT dup_run_stats(CAST(array() AS ARRAY<BIGINT>)) FROM __drs")
      .head.getSeq[Long](0)
    assert(e == Seq(0L, 0L))
  }

  test("bucket_counts: a negative key fails loudly with the offending value") {
    // public SQL function — the non-negative contract is enforced, not a
    // comment: Java % on a negative long would otherwise throw an opaque
    // ArrayIndexOutOfBoundsException inside an executor task (or, with
    // floorMod, silently disagree with SQL's x % m)
    val e = intercept[Exception] {
      base.select(SketchExpressions.bucket_counts(
        array(lit(5L), lit(-7L) - col("doc_id")), 64).as("bc")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("bucket_counts") && c.getMessage.contains("negative")),
      s"expected the fail-loud message, got: $e")
  }

  test("sorted_intersect_count: compiles and equals size(array_intersect) " +
      "on sorted-distinct arrays") {
    // the equivalence contract the dedup verifies rely on: for sorted
    // ascending DISTINCT inputs the merge count is bit-identical to the
    // built-in's hash-set intersect — property-checked over 200 random
    // sorted-distinct pairs (including empty and disjoint shapes)
    val rnd = new scala.util.Random(41)
    val rows = (0 until 200).map { i =>
      def arr() = rnd.shuffle((0L until 60L).toList)
        .take(rnd.nextInt(12) * rnd.nextInt(5)).distinct.sorted
      (i.toLong, arr(), arr())
    }
    // parquet round-trip (the `base` discipline): a LocalRelation input
    // constant-folds the projection away and nothing reaches codegen
    val tmp = java.nio.file.Files.createTempDirectory("sic").toString + "/t.parquet"
    spark.createDataFrame(rows).toDF("id", "xs", "ys")
      .write.mode("overwrite").parquet(tmp)
    val df0 = spark.read.parquet(tmp)
    val df = df0.select(col("id"),
      SketchExpressions.sorted_intersect_count(col("xs"), col("ys")).as("mc"),
      size(array_intersect(col("xs"), col("ys"))).as("bi"))
    assertCodegen(df, "ExprKernels.sortedIntersectCount")
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"row ${r.getLong(0)}: " +
        s"merge=${r.getInt(1)} builtin=${r.getInt(2)}")
    }
  }

  test("term_run_counts / fp_run_counts: compile and equal the " +
      "explode+groupBy multiset rollup") {
    import org.apache.spark.sql.graft.TextExpressions.{term_run_counts, fp_run_counts}
    // random multisets with deliberate repeats, incl. an empty-array row
    val rnd = new scala.util.Random(23)
    val tmp = java.nio.file.Files.createTempDirectory("trc").toString + "/t.parquet"
    val rows = (0 until 150).map { i =>
      val ws = Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(8)}")
      (i.toLong, ws, ws.map(w => (w.hashCode % 5).toLong))
    }
    spark.createDataFrame(rows).toDF("id", "ws", "fps")
      .write.mode("overwrite").parquet(tmp)
    val df0 = spark.read.parquet(tmp)
    val df = df0.select(col("id"),
      term_run_counts(col("ws")).as("tc"), fp_run_counts(col("fps")).as("fc"))
    assertCodegen(df, "ExprKernels.termRunCounts", "ExprKernels.fpRunCounts")
    val inRowT = df.select(col("id"), explode(col("tc")).as("kv"))
      .select(col("id"), col("kv.term"), col("kv.c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val grpT = df0.select(col("id"), explode(col("ws")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(inRowT == grpT)
    val inRowF = df.select(col("id"), explode(col("fc")).as("kv"))
      .select(col("id"), col("kv.fp"), col("kv.c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val grpF = df0.select(col("id"), explode(col("fps")).as("fp"))
      .groupBy("id", "fp").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inRowF == grpF)
  }

  test("token_stats: compiles and equals the two-level aggregate twin") {
    import org.apache.spark.sql.graft.TextExpressions.token_stats
    val rnd = new scala.util.Random(37)
    val tmp = java.nio.file.Files.createTempDirectory("tks").toString + "/t.parquet"
    val rows = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(s"w${rnd.nextInt(6)}"))
    }
    spark.createDataFrame(rows).toDF("id", "ws")
      .write.mode("overwrite").parquet(tmp)
    val df0 = spark.read.parquet(tmp)
    val df = df0.select(col("id"), token_stats(col("ws")).as("ts"))
    assertCodegen(df, "ExprKernels.tokenStats")
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df0.select(col("id"), explode(col("ws")).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(sum("c").as("n"), count(lit(1)).as("k"), max("c").as("top"))
      .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    df0.collect().foreach { r =>
      val id = r.getLong(0)
      assert(got(id) == want.getOrElse(id, Seq(0L, 0L, 0L)), s"row $id")
    }
  }

  test("remove_tokens: compiles and equals the explode/anti-mark/re-collect " +
      "reassembly") {
    import org.apache.spark.sql.graft.TextExpressions.remove_tokens
    val rnd = new scala.util.Random(31)
    val tmp = java.nio.file.Files.createTempDirectory("rmt").toString + "/t.parquet"
    val rows = (0 until 120).map { i =>
      val n = rnd.nextInt(14)
      val w = Seq.fill(n)(if (rnd.nextInt(6) == 0) "" else s"t${rnd.nextInt(9)}")
      val drops = (1 to n).filter(_ => rnd.nextInt(3) == 0)
      (i.toLong, w, drops)
    } :+ ((999L, Seq.empty[String], Seq.empty[Int]))
    spark.createDataFrame(rows).toDF("id", "w", "drops")
      .write.mode("overwrite").parquet(tmp)
    val df0 = spark.read.parquet(tmp)
    val df = df0.select(col("id"), remove_tokens(col("w"), col("drops")).as("kept"))
    assertCodegen(df, "ExprKernels.removeTokens")
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    df0.collect().foreach { r =>
      val w = r.getSeq[String](1)
      val drops = r.getSeq[Int](2).toSet
      val want = w.zipWithIndex.collect { case (t, i) if !drops(i + 1) => t }
        .mkString(" ")
      assert(got(r.getLong(0)) == want, s"row ${r.getLong(0)}")
    }
  }

  test("bloom_hits: generated stage compiles and counts exactly") {
    // a small filter over known longs: the expression must compile into
    // the fused stage AND agree with a direct membership count (no false
    // negatives: all inserted keys hit)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    Seq(1L, 2L, 3L).foreach(bf.putLong)
    val df = base.select(col("doc_id"),
      SketchExpressions.bloom_hits(
        array(lit(1L), lit(2L), col("doc_id") + lit(1000000L)), bf).as("h"))
    assertCodegen(df, "ExprKernels.bloomHits")
    // inserted keys always hit; the shifted doc_id almost surely misses,
    // but Bloom fpp means >= is the only sound lower assertion
    df.collect().foreach(r => assert(r.getLong(1) >= 2L))
  }

  test("vector expressions: generated stage compiles") {
    val codebook = Seq(0L -> Seq(0.0, 0.1, 0.2, 0.3), 1L -> Seq(1.0, 1.1, 1.2, 1.3))
    val df = base.select(
      VectorExpressions.float_dot(col("emb"), col("emb")).as("dot"),
      VectorExpressions.float_norm(col("emb")).as("nrm"),
      VectorExpressions.nearest_centroid(col("emb"), codebook, offset = 2).as("nc"),
      VectorExpressions.vec_normalize(col("emb"), Seq(0.5f, 1.5f), 2.0f).as("vn"),
      SumExpressions.decimal9_nanos(col("d")).as("n9"))
    // float_dot / float_norm emit inline loops (no named kernel call); the
    // compiledSources nonEmpty + all-compile assertions cover them because
    // the whole projection is one stage
    assertCodegen(df,
      "ExprKernels.nearestCentroid", "ExprKernels.vecNormalize",
      "Decimal9Nanos$.MODULE$.nanos")
  }

  test("image/audio/json/scrub expressions: generated stage compiles") {
    val df = base.select(
      ImageExpressions.dhash64(
        ImageExpressions.pcm_synth(col("text"), lit(64), lit(1)),
        lit(1), lit(4), lit(5)).as("dh"),
      ImageExpressions.pcm_window_stats(
        ImageExpressions.pcm_synth(col("text"), lit(64), lit(3)), lit(4)).as("pw"),
      JsonExpressions.json_long_field(col("json"), "k").as("jl"),
      RegexScrub.regex_scrub(col("text"), Seq("fox|box" -> "***")).as("rs"))
    assertCodegen(df,
      "Multimodal.dhash64", "Multimodal.pcmFromCodepoints",
      "PcmWindowStats.evalWindows", "ExprKernels.jsonLongField",
      "RegexScrub$.MODULE$.scrub")
  }

  test("moment_cells: bit-equal to the explode+groupBy twin (ragged, both widths) and compiles") {
    // r22: q90/streaming/whitening aggregate with MomentCellsAgg (per-row
    // partial moment vectors). The equivalence contract — explode the
    // aggregate's cell array and you get EXACTLY
    // explode(momentTerms) → groupBy(i, j) → (count, sum) — is pinned over
    // a RAGGED corpus (lengths 0..11, incl. empty arrays and null rows)
    // through a parquet round-trip so the generated stage actually runs,
    // for BOTH accumulator widths.
    // lengths 1..11 for the twin comparison: the explode twin ERRORS on
    // empty arrays (Spark's sequence(0, size-1) at size 0 is [0, -1] and
    // indexes out of bounds) where the oracle's range(0, 0) is empty —
    // the aggregate follows the ORACLE (empty rows contribute nothing),
    // checked separately below.
    import org.apache.spark.sql.graft.MomentCellsAgg.moment_cells
    val rnd = new scala.util.Random(90)
    val rows = (0 until 300).map { i =>
      val d = 1 + rnd.nextInt(11)
      val arr =
        if (i % 37 == 5) null
        else Array.fill(d)((rnd.nextGaussian() * 2).toFloat)
      (i.toLong, arr)
    }
    val dir = java.nio.file.Files.createTempDirectory("mcells").toString
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val emb = spark.read.parquet(dir)
    val twin = emb
      .select(queries.VectorOps.momentTerms("embedding").as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("t.p")).as("s_n9"))
      .orderBy("i", "j").collect()
    assert(twin.nonEmpty)
    Seq(false, true).foreach { wide =>
      val viaAgg = emb
        .agg(moment_cells(col("embedding"), wide).as("mc"))
        .select(explode(col("mc")).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"),
          col("c.n").as("n"), col("c.s_n9").as("s_n9"))
        .orderBy("i", "j").collect()
      assert(viaAgg.length == twin.length, s"wide=$wide cell-count mismatch")
      viaAgg.zip(twin).foreach { case (a, b) =>
        assert(a == b, s"wide=$wide: $a != $b")
      }
    }
    // empty arrays and null rows contribute NOTHING (oracle semantics:
    // unnest(range(0, 0)) is empty) — an all-degenerate corpus yields an
    // empty cell array
    val degDir = java.nio.file.Files.createTempDirectory("mcells0").toString
    spark.createDataFrame(Seq(
        (1L, Array.empty[Float]), (2L, null.asInstanceOf[Array[Float]])))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(degDir)
    val deg = spark.read.parquet(degDir)
      .agg(moment_cells(col("embedding"), wide = true).as("mc"))
      .select(explode(col("mc"))).count()
    assert(deg == 0L, s"degenerate rows produced $deg cells")
    // physicality: ObjectHashAggregate over the in-place MomentBuf, no
    // Generate fan-out. (Whole-stage codegen of the aggregate itself is
    // IMPOSSIBLE for any 2080-slot buffer formulation — Spark 4.1's
    // AggregateCodegenSupport gates on UnsafeRow-mutable buffer types —
    // so the guard here is the plan shape plus the bit-equivalence above;
    // the scan/project stages below the aggregate must still compile.)
    val cg = emb.agg(moment_cells(col("embedding"), wide = false).as("mc"))
    cg.collect()
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Generate"), plan)
    compiledSources(cg)
  }

  test("q71/q72/q79 multimodal pipelines: every codegen stage compiles") {
    // the three registered queries whose hot path rides the image/audio
    // expressions — the exact stage that silently de-codegen'd in round 12
    Seq(
      queries.MultimodalOps.q71ImageNeardup.fn(spark, sf),
      queries.MultimodalOps.q72AudioFeatures.fn(spark, sf),
      queries.MultimodalOps.q79VideoShots.fn(spark, sf)
    ).foreach { df =>
      val subtrees = org.apache.spark.sql.execution.debug.codegenStringSeq(
        df.queryExecution.executedPlan)
      subtrees.foreach { case (name, _, stats) =>
        assert(stats.maxMethodCodeSize >= 0,
          s"generated Java FAILED to compile in subtree:\n$name")
      }
    }
  }
}
