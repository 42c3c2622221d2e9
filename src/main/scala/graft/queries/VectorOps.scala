package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding/vector operators over the `embeddings` table: element-wise
  * vector aggregation (SURVEY A1 VectorMean) and similarity search
  * (LLM-pipeline brute-force top-k + near-dup pairs).
  *
  * Float parity strategy (see VectorFunctions): per-row dot products are
  * sequential double folds — bit-deterministic across engines, fully on
  * the codegen'd FloatVectorDot hot path. Exact VARCHAR-routed DECIMAL
  * arithmetic is reserved for the order-NONdeterministic grouped sums
  * (q26 vector mean, q42 k-means centroids), where shuffle/partial-agg
  * ordering would otherwise perturb double summation.
  */
object VectorOps {

  private def fdot(a: String, b: String) =
    org.apache.spark.sql.graft.VectorExpressions.float_dot(col(a), col(b))
  private def fdot2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.VectorExpressions.float_dot(a, b)

  /** Q26 — element-wise vector mean per label (SURVEY A1: the VectorMean
    * UDAF, reference VectorMean.scala:17-64, reformulated as
    * posexplode→partial-agg). Scale notes: the explode shards the
    * (label, idx) key space across executors — the classic way to aggregate
    * billions of vectors without a per-executor dense buffer; the typed
    * Aggregator twin (graft.agg.VectorMean) is the low-latency small-N path.
    * Sum unscaled stays < 2^53 at scale 9 so the final double is exact.
    * Output shape is exploded scalar rows (label, idx, m, n_vecs) — the
    * driver's pandas gate cannot sort/hash array columns, and the scalar
    * form is the shape the partial aggregation computes anyway.
    */
  val q26VectorMean: QueryDef = QueryDef.sql(
    "q26_vector_mean",
    """SELECT label, CAST(idx AS BIGINT) AS idx,
      |  CAST(CAST(sum(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS DOUBLE) / count(*) AS m,
      |  count(*) AS n_vecs
      |FROM (SELECT label, unnest(embedding) AS v, unnest(range(0, len(embedding))) AS idx
      |      FROM embeddings)
      |GROUP BY label, idx
      |ORDER BY label, idx""".stripMargin) { (s, dir) =>
    // exact sum as Sum128 over scale-9 unscaled longs — bit-identical to
    // sum(CAST(v AS DECIMAL(18,9))) without per-row Decimal allocation
    // (see Sum128.scala / Decimal9Nanos)
    Tables(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy(col("label"), col("idx").cast(LongType).as("idx"))
      .agg((org.apache.spark.sql.graft.SumExpressions
        .sum128Nanos(org.apache.spark.sql.graft.SumExpressions
          .decimal9_nanos(col("v").cast(DoubleType)))
        .cast(DoubleType) / count(lit(1))).as("m"),
        count(lit(1)).as("n_vecs"))
      .orderBy("label", "idx")
  }

  /** Q27 — brute-force maximum-inner-product top-k against a fixed query
    * vector (LLM-pipeline similarity search baseline). Map-only scan +
    * TakeOrderedAndProject: at 100 TB this is one pass, no shuffle — the
    * pattern IVF/LSH variants prune. Query vector is broadcast.
    */
  val q27DotTopk: QueryDef = QueryDef.sql(
    "q27_dot_topk",
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, e.label, ${DotSeqSql("e.embedding", "q.qv")} AS dot
       |FROM embeddings e, q
       |WHERE e.vec_id <> 0
       |ORDER BY dot DESC, vec_id
       |LIMIT 20""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), fdot("embedding", "qv").as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(20)
  }

  /** Q28 — embedding near-duplicate pairs, blocked by label (LLM-pipeline
    * embedding-similarity dedup). Blocking bounds the quadratic term to
    * within-block pairs — the same role LSH buckets play at scale; the
    * block key becomes the shuffle key so blocks are processed in parallel.
    */
  val q28EmbeddingNeardup: QueryDef = QueryDef.sql(
    "q28_embedding_neardup",
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
       |  ${DotSeqSql("a.embedding", "b.embedding")} AS dot
       |FROM embeddings a
       |JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${DotSeqSql("a.embedding", "b.embedding")} > 0.25
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("label"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      // the threshold compares the SAME sequential-double dot in both
      // engines (0.25 is binary-exact), so the survivor set is identical —
      // one codegen'd FloatVectorDot per candidate, no decimal second pass
      .withColumn("dot", fdot("ea", "eb"))
      .filter(col("dot") > 0.25)
      .select(col("id_a"), col("id_b"), col("label"), col("dot"))
      .orderBy("id_a", "id_b")
  }

  /** Fixed random-hyperplane family for sign-LSH: 16 planes × 64 integer
    * coefficients in [-9, 9], generated by a deterministic formula and
    * spliced into both engines as literals. 16 planes → 2^16 buckets: at
    * 100 TB the probe reads ~N/65536 of the corpus per probed bucket
    * (vs N/256 with 8 planes), with recall recovered by multiprobe below.
    */
  private val planes: Seq[Seq[Int]] =
    Seq.tabulate(16, 64)((j, i) => ((j * 97 + i * 31) % 19) - 9)

  /** Multiprobe masks: all 16-bit patterns with ≤2 bits set (1 + 16 + 120 =
    * 137). Probing `qb XOR mask` visits every bucket within hamming 2 of
    * the query's — the standard recall/selectivity trade for wide sign-LSH
    * (probes cover ~137/65536 ≈ 0.2% of the corpus instead of 1/256).
    */
  private val probeMasks: Seq[Int] =
    (0 until 65536).filter(Integer.bitCount(_) <= 2)

  /** Bucket bit j = sign of dot(embedding, plane_j). The plane coefficients
    * are small ints (exact in float AND double), so Spark evaluates each
    * dot on the codegen'd FloatVectorDot against a float-array literal
    * while the oracle folds the identical double products sequentially —
    * bit-equal signs, no decimals.
    */
  /** Public so layout code (and the partition-pruning spec) can key
    * storage by the same bucket the probe filters on.
    */
  def lshBucket: org.apache.spark.sql.Column = bucketCol

  private def bucketCol: org.apache.spark.sql.Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(org.apache.spark.sql.graft.VectorExpressions
        .float_dot(col("embedding"), lit(p.map(_.toFloat).toArray)) > 0d,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def bucketDuck: String = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val arr = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), CAST($arr AS DOUBLE[])) > 0 " +
        s"THEN ${1L << j}::BIGINT ELSE 0::BIGINT END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** Q34 — bucketed approximate nearest neighbours: 16-plane sign-LSH
    * bucket per vector, hamming-≤2 multiprobe around the query's bucket,
    * exact max-inner-product ranking of the probed members.
    *
    * This is the sublinear scale path q27's brute force motivates: the
    * bucket id is computed map-only at ingest; the search probes 137 of
    * 65536 buckets (a partition-prunable IN-list at 100 TB when bucket is
    * a partition or Z-order key — each probed bucket holds ~N/65536 rows)
    * and ranks only their members. The probe list is tiny and broadcast;
    * the corpus joins it on the bucket key with no shuffle of the corpus.
    */
  val q34AnnLsh: QueryDef = QueryDef.sql(
    "q34_ann_lsh",
    s"""WITH b AS (SELECT vec_id, label, embedding, $bucketDuck AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
       |probes AS (SELECT xor(q.qb, m) AS pb, q.qv FROM q, unnest([${probeMasks.mkString(",")}]) AS t(m))
       |SELECT e.vec_id, e.label, e.bucket, ${DotSeqSql("e.embedding", "p.qv")} AS dot
       |FROM b e JOIN probes p ON e.bucket = p.pb
       |WHERE e.vec_id <> 0
       |ORDER BY dot DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
      .withColumn("bucket", bucketCol)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("bucket").as("qb"))
    val probes = q
      .select(col("qv"), col("qb"), explode(lit(probeMasks.toArray)).as("mask"))
      .select(col("qv"), expr("qb ^ mask").as("pb"))
    emb.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), col("bucket") === col("pb"))
      .select(col("vec_id"), col("label"), col("bucket"), fdot("embedding", "qv").as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(10)
  }

  /** Q42 — IVF approximate nearest neighbours: k-means coarse quantization
    * (graft.ml.KMeans — labeled warm start + one Lloyd refinement), then
    * MULTIPROBE the query's nprobe=2 nearest cells and rank them exactly.
    *
    * Cross-engine determinism: centroids are decimal-exact means cast to
    * double (identical), distances are sequential left-to-right double
    * folds (identical IEEE), argmin ties break on cell id. The assignment
    * reduction groups on vec_id only — the embedding rides as an
    * aggregation payload, NOT in the shuffle key. At scale the assignment
    * is the ingest-time map; the probe reads nprobe/k of the corpus — the
    * IVF complement to q34's hyperplane buckets.
    */
  /** q42/q53 shared oracle pieces: decimal-exact centroid means, the
    * sequential-fold squared distance, and the argmin assignment.
    */
  private def CentSql(rel: String, key: String) =
    s"""SELECT $key AS c_label, list(m ORDER BY idx) AS centroid
       |  FROM (
       |    SELECT $key, idx,
       |      CAST(CAST(sum(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS DOUBLE) / count(*) AS m
       |    FROM (SELECT $key, unnest(embedding) AS v, unnest(range(0, len(embedding))) AS idx
       |          FROM $rel)
       |    GROUP BY $key, idx)
       |  GROUP BY $key""".stripMargin
  private val DistSql = // sequential fold => bit-identical to Spark's aggregate()
    "list_reduce([(CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]) " +
      "for i in range(1, len(e.embedding)+1)], (a, b) -> a + b)"
  private def AssignSql(vecsRel: String, centsRel: String) =
    s"""SELECT vec_id, label, embedding, cell FROM (
       |    SELECT e.vec_id, e.label, e.embedding, c.c_label AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $DistSql, c.c_label) AS rn
       |    FROM $vecsRel e, $centsRel c) t
       |  WHERE rn = 1""".stripMargin

  /** The q42 IVF training + probe CTE chain (shared with q53's meter):
    * k-means over the whole table, then nprobe-2 probe cells for the
    * first `nQueries` vectors (qprobe carries the query id so multi-query
    * consumers can rank per query).
    */
  private def IvfCtes(nQueries: Int): String =
    s"""c0 AS (${CentSql("embeddings", "label")}),
       |a0 AS (${AssignSql("embeddings", "c0")}),
       |c1 AS (${CentSql("a0", "cell")}),
       |a1 AS (${AssignSql("a0", "c1")}),
       |q AS (SELECT vec_id, embedding FROM a1 WHERE vec_id < $nQueries),
       |qprobe AS (
       |  SELECT qid, qv, pcell FROM (
       |    SELECT e.vec_id AS qid, e.embedding AS qv, c.c_label AS pcell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $DistSql, c.c_label) AS rn
       |    FROM q e, c1 c) t
       |  WHERE rn <= 2)""".stripMargin

  val q42AnnIvf: QueryDef = {
    QueryDef.sql(
      "q42_ann_ivf",
      s"""WITH ${IvfCtes(1)}
         |SELECT e.vec_id, e.label, e.cell, ${DotSeqSql("e.embedding", "p.qv")} AS dot
         |FROM a1 e JOIN qprobe p ON e.cell = p.pcell
         |WHERE e.vec_id <> 0
         |ORDER BY dot DESC, vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      import graft.ml.KMeans
      val emb = Tables(s, dir, "embeddings")
      // Each centroid table is collected to the driver (k·dim doubles)
      // and the assignments become map-only argmin folds: a0/a1 appear
      // several times in the DAG, and a map-only recompute is cheaper
      // than either the crossJoin+exchange form or persisting the
      // embedding-carrying rows (the round-4 persist experiment)
      val c0 = KMeans.collectCentroids(KMeans.centroids(
        emb.withColumn("__k", col("label")), "__k"))
      val a0 = KMeans.assignWith(emb, c0)
      val c1 = KMeans.collectCentroids(KMeans.centroids(a0, "cell"))
      // assignment depends only on the embedding, so a1 reads emb directly
      // — rebasing off a0 would re-evaluate a0's argmin fold on every a1
      // recompute for a cell column assignWith overwrites anyway
      val a1 = KMeans.assignWith(emb, c1)
      // nprobe=2: search the query's two nearest cells — the IVF
      // recall/read trade (reads ~2/k of the corpus, catches neighbors
      // across the query's nearest Voronoi boundary). The single query
      // vector collects through a pushed-down vec_id scan and its probe
      // cells are driver math over the already-collected centroids — no
      // probe-set job, no broadcast build; the probe predicate lands in
      // the scan as an IN filter.
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head.getSeq[Float](0)
      val probeCells = KMeans.probeCellsLocal(qv, c1, nprobe = 2)
      a1.filter(col("vec_id") =!= 0 && col("cell").isin(probeCells: _*))
        .select(col("vec_id"), col("label"), col("cell"),
          fdot2(col("embedding"), lit(qv.toArray)).as("dot"))
        .orderBy(col("dot").desc, col("vec_id"))
        .limit(10)
    }
  }

  /** Q46 — embedding near-dup pairs via BANDED sign-LSH blocking: the
    * generic scale path q28's label-blocking stands in for. The 16-bit
    * sign-LSH bucket splits into 4 bands × 4 planes; pairs sharing any band
    * key are candidates (shuffle keyed on (band, key) — sub-quadratic), and
    * survivors verify with the exact sequential-double dot.
    *
    * ANN semantics by design: banding trades recall for selectivity on the
    * LSH S-curve (here ~40% recall at dot > 0.25 examining ~25% of the
    * pair space on this data; production tuning raises planes-per-band and
    * band count with the same plan shape). Compare q28: label blocking
    * found 293 of 2818 true pairs at sf0.01 — this generic blocker finds
    * ~1130 with no label oracle.
    */
  val q46EmbeddingNeardupLsh: QueryDef = QueryDef.sql(
    "q46_embedding_neardup_lsh",
    s"""WITH b AS (SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings),
       |bands AS (
       |  SELECT vec_id, bucket, j AS band, (bucket >> (4*j)) & 15 AS bk
       |  FROM b, unnest([0, 1, 2, 3]) AS t(j)),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bk = y.bk AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, dot,
       |  dot / (sqrt(naa) * sqrt(nbb)) AS cosine
       |FROM (
       |  SELECT c.id_a, c.id_b, ${DotSeqSql("ea.embedding", "eb.embedding")} AS dot,
       |    ${DotSeqSql("ea.embedding", "ea.embedding")} AS naa,
       |    ${DotSeqSql("eb.embedding", "eb.embedding")} AS nbb
       |  FROM cand c
       |  JOIN b ea ON ea.vec_id = c.id_a
       |  JOIN b eb ON eb.vec_id = c.id_b)
       |WHERE dot > 0.25
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
      .withColumn("bucket", bucketCol)
      .select("vec_id", "embedding", "bucket")
    val bands = emb
      .select(col("vec_id"), col("bucket"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bk", expr("shiftright(bucket, 4*band) & 15"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    cand
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .withColumn("dot", fdot("ea", "eb"))
      .filter(col("dot") > 0.25)
      // cosine from the same sequential-double folds: norms via the
      // codegen'd float_norm (sqrt of the self-dot — sqrt is one
      // correctly-rounded op, identical cross-engine)
      .withColumn("cosine", col("dot") /
        (org.apache.spark.sql.graft.VectorExpressions.float_norm(col("ea")) *
          org.apache.spark.sql.graft.VectorExpressions.float_norm(col("eb"))))
      .select("id_a", "id_b", "dot", "cosine")
      .orderBy("id_a", "id_b")
  }

  /** The meter's query-set size: vectors 0..7 are held out as queries;
    * the searched corpus is everything else.
    */
  private val RecallQueries = 8

  /** Q53 — ANN quality gate: recall@10 of BOTH approximate searches (q34
    * multiprobe sign-LSH, q42 nprobe-2 IVF) against the exact scan, over
    * an 8-query held-out set, computed inside the engine. A production
    * ANN deployment ships with exactly this query — recall/read-fraction
    * is the tunable and this is its meter (re-run after changing
    * planes/probes/nprobe; at 100 TB the query sample grows, the shape
    * doesn't). One row per (method, query) so the distribution is
    * visible, not just the mean.
    *
    * The rows also tell the structural story on this corpus: IVF's
    * learned cells track the label clusters the data actually has, while
    * hamming-2 multiprobe over isotropic sign-LSH buckets rarely reaches
    * the true top-10 — the meter is what justifies the index choice.
    *
    * Determinism: all rankings are the same sequential-double dots under
    * a per-query (dot DESC, vec_id) total order, so both engines derive
    * identical top-10 sets and identical n/10 recall doubles. A corpus
    * vector matches at most one probe row per query (one bucket/cell per
    * vector, distinct probe keys per query), so no candidate dedup is
    * needed before ranking.
    */
  val q53AnnRecall: QueryDef = QueryDef.sql(
    "q53_ann_recall",
    s"""WITH ${IvfCtes(RecallQueries)},
       |b AS (SELECT vec_id, embedding, $bucketDuck AS bucket FROM embeddings),
       |corpus AS (SELECT * FROM b WHERE vec_id >= $RecallQueries),
       |lq AS (SELECT vec_id AS qid, embedding AS qv, bucket AS qb FROM b
       |       WHERE vec_id < $RecallQueries),
       |probes AS (SELECT lq.qid, xor(lq.qb, m) AS pb, lq.qv
       |           FROM lq, unnest([${probeMasks.mkString(",")}]) AS t(m)),
       |lsh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT p.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "p.qv")} DESC, e.vec_id) AS rn
       |    FROM corpus e JOIN probes p ON e.bucket = p.pb) t
       |  WHERE rn <= 10),
       |ivf AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT p.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "p.qv")} DESC, e.vec_id) AS rn
       |    FROM a1 e JOIN qprobe p ON e.cell = p.pcell
       |    WHERE e.vec_id >= $RecallQueries) t
       |  WHERE rn <= 10),
       |exact AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT q.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "q.qv")} DESC, e.vec_id) AS rn
       |    FROM (SELECT vec_id, embedding FROM embeddings
       |          WHERE vec_id >= $RecallQueries) e,
       |         (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |          WHERE vec_id < $RecallQueries) q) t
       |  WHERE rn <= 10),
       |hits AS (
       |  SELECT 'ivf' AS method, exact.qid,
       |    count(ivf.vec_id) AS n_overlap
       |  FROM exact LEFT JOIN ivf
       |    ON exact.qid = ivf.qid AND exact.vec_id = ivf.vec_id
       |  GROUP BY exact.qid
       |  UNION ALL
       |  SELECT 'lsh' AS method, exact.qid,
       |    count(lsh.vec_id) AS n_overlap
       |  FROM exact LEFT JOIN lsh
       |    ON exact.qid = lsh.qid AND exact.vec_id = lsh.vec_id
       |  GROUP BY exact.qid)
       |SELECT method, qid, n_overlap, n_overlap / 10 AS recall
       |FROM hits
       |ORDER BY method, qid""".stripMargin) { (s, dir) =>
    import graft.ml.KMeans
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(s, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= RecallQueries)
    val queries = emb.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def top10(cands: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("qid")
        .orderBy(fdot("embedding", "qv").desc, col("vec_id"))
      cands.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("qid", "vec_id")
    }
    // exact baseline: corpus × 8 broadcast queries, ranked per query
    val exact = top10(corpus.crossJoin(broadcast(queries)))
    // q34 arm: multiprobe sign-LSH (distinct probe buckets per query ⇒ a
    // corpus vector matches at most one probe row per query)
    val withBucket = emb.withColumn("bucket", bucketCol)
    val probes = withBucket.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("bucket").as("qb"))
      .select(col("qid"), col("qv"), col("qb"),
        explode(lit(probeMasks.toArray)).as("mask"))
      .select(col("qid"), col("qv"), expr("qb ^ mask").as("pb"))
    val lsh = top10(withBucket.filter(col("vec_id") >= RecallQueries)
      .join(broadcast(probes), col("bucket") === col("pb")))
    // q42 arm: nprobe-2 IVF over the collected-centroid assignment
    val c0 = KMeans.collectCentroids(KMeans.centroids(
      emb.withColumn("__k", col("label")), "__k"))
    val c1 = KMeans.collectCentroids(KMeans.centroids(
      KMeans.assignWith(emb, c0), "cell"))
    val a1 = KMeans.assignWith(emb, c1)
    // probe cells are driver math over the collected centroids (same
    // fold/tie order as the distributed form — see q42): one pushed-down
    // scan collects the 8 query vectors, the probe table becomes a
    // literal 16-row broadcast
    val qvs = emb.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probeRows = qvs.flatMap { case (qid, qv) =>
      KMeans.probeCellsLocal(qv, c1, nprobe = 2).map(c => (qid, c, qv))
    }.toSeq
    val probeSet = s.createDataFrame(probeRows)
      .toDF("qid", "pcell", "qv")
    val ivf = top10(a1.filter(col("vec_id") >= RecallQueries)
      .join(broadcast(probeSet), col("cell") === col("pcell")))
    def arm(name: String, approx: org.apache.spark.sql.DataFrame) = {
      val a = approx.withColumnRenamed("qid", "aqid")
        .withColumnRenamed("vec_id", "hit")
      exact.join(a,
          col("qid") === col("aqid") && col("vec_id") === col("hit"), "left")
        .groupBy(col("qid"))
        .agg(count(col("hit")).as("n_overlap"))
        .select(lit(name).as("method"), col("qid"), col("n_overlap"))
    }
    arm("ivf", ivf).unionAll(arm("lsh", lsh))
      .withColumn("recall", col("n_overlap") / lit(10))
      .orderBy("method", "qid")
  }

  /** Q58 — product-quantization ANN (the memory-side scale path IVF/LSH
    * don't cover): the 64-dim vector splits into 8 subspaces of 8 dims;
    * each subvector quantizes to its nearest sub-codebook centroid
    * (codebooks = 8-dim slices of the label-mean centroids, k=10), so a
    * vector compresses to 8 4-bit codes — a 32-bit `pq_code` standing in
    * for 256 bytes of floats. Search is asymmetric distance computation
    * (ADC): the query builds an 8×10 lookup table of subvector dots once,
    * and each corpus vector scores as the SUM OF 8 TABLE LOOKUPS — no
    * float math per row at scan time. Top-10 by ADC, with the exact dot
    * alongside (the quantization-error readout; rerank-by-exact is the
    * production follow-up).
    *
    * Scale notes: codebook training collects k·dim doubles once (the q42
    * centroid table reused as sliced sub-codebooks); encoding is the
    * map-only ingest step (at 100 TB it would be a native PQEncode
    * expression; here the argmin composes slice/zip_with folds); the LUT
    * is driver math; the scan reads codes, not vectors — the 30×
    * bandwidth reduction is the whole point of PQ. Determinism: centroid
    * means are decimal-exact, sub-distances and LUT dots are sequential
    * double folds, argmin ties break on label, the ADC sum folds in fixed
    * subspace order — bit-identical cross-engine, no decimals in flight.
    */
  val q58AnnPq: QueryDef = {
    val M = 8 // subspaces
    val D = 8 // dims per subspace
    val SubDistDuck =
      "list_reduce([(CAST(e.embedding[8*s.sub+i] AS DOUBLE) - c.centroid[8*s.sub+i]) * " +
        "(CAST(e.embedding[8*s.sub+i] AS DOUBLE) - c.centroid[8*s.sub+i]) " +
        "for i in range(1, 9)], (a, b) -> a + b)"
    QueryDef.sql(
      "q58_ann_pq",
      s"""WITH c0 AS (${CentSql("embeddings", "label")}),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |codes AS (
         |  SELECT vec_id, label, sub, cl AS code FROM (
         |    SELECT e.vec_id, e.label, s.sub, c.c_label AS cl,
         |      row_number() OVER (PARTITION BY e.vec_id, s.sub
         |        ORDER BY $SubDistDuck, c.c_label) AS rn
         |    FROM embeddings e, unnest(range(0, $M)) AS s(sub), c0 c
         |    WHERE e.vec_id <> 0) t
         |  WHERE rn = 1),
         |lut AS (
         |  SELECT s.sub, c.c_label,
         |    list_dot_product(CAST(qv[8*s.sub+1 : 8*s.sub+$D] AS DOUBLE[]),
         |      c.centroid[8*s.sub+1 : 8*s.sub+$D]) AS lv
         |  FROM q, unnest(range(0, $M)) AS s(sub), c0 c),
         |adc AS (
         |  SELECT codes.vec_id, min(codes.label) AS label,
         |    CAST(list_reduce(list_prepend(0::BIGINT,
         |      list(codes.code * (1::BIGINT << (4*codes.sub)) ORDER BY codes.sub)),
         |      (a, b) -> a + b) AS BIGINT) AS pq_code,
         |    list_reduce(list_prepend(0.0, list(lut.lv ORDER BY codes.sub)),
         |      (a, b) -> a + b) AS adc
         |  FROM codes JOIN lut ON codes.sub = lut.sub AND codes.code = lut.c_label
         |  GROUP BY codes.vec_id)
         |SELECT a.vec_id, a.label, a.pq_code, a.adc,
         |  ${DotSeqSql("e.embedding", "q.qv")} AS dot
         |FROM adc a
         |JOIN embeddings e ON e.vec_id = a.vec_id
         |CROSS JOIN q
         |ORDER BY adc DESC, a.vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      import graft.ml.KMeans
      val emb = Tables(s, dir, "embeddings")
      val c0 = KMeans.collectCentroids(KMeans.centroids(
        emb.withColumn("__k", col("label")), "__k"))
      // Both engines pack the centroid LABEL (not its position) into the
      // 4-bit pq_code fields, so the label domain is a format constraint:
      require(c0.forall { case (l, _) => l >= 0 && l < 16 },
        s"pq_code packs labels into 4-bit fields; centroid labels must be in [0,16), " +
          s"got ${c0.map(_._1).mkString(",")}")
      // sub-codebooks: 8-dim slices of the (sorted-label) centroid table
      val cb: Seq[Seq[(Long, Seq[Double])]] =
        (0 until M).map(sub => c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head.getSeq[Float](0)
      // ADC lookup table, driver math: same sequential fold as the oracle's
      // list_dot_product over the identical doubles
      val lut: Seq[Seq[Double]] = (0 until M).map { sub =>
        cb(sub).map { case (_, c) =>
          var acc = 0.0
          var i = 0
          while (i < D) { acc += qv(sub * D + i).toDouble * c(i); i += 1 }
          acc
        }
      }
      // per-subspace quantizer: the native NearestCentroid argmin over the
      // 8-dim slice starting at sub*D (no per-row slice/zip_with/struct
      // allocation — the "native PQEncode expression" of the scale notes)
      def codeCol(sub: Int): org.apache.spark.sql.Column =
        org.apache.spark.sql.graft.VectorExpressions
          .nearest_centroid(col("embedding"), cb(sub), offset = sub * D)
      val coded = emb.filter(col("vec_id") =!= 0)
        .select(Seq(col("vec_id"), col("label"), col("embedding")) ++
          (0 until M).map(sub => codeCol(sub).as(s"code_$sub")): _*)
      val pqCode = (0 until M).map(sub => col(s"code_$sub") * lit(1L << (4 * sub)))
        .reduce(_ + _)
      // LUT lookup is label-KEYED (map, not positional array): the oracle
      // joins lut on c_label, so a non-contiguous label domain must still
      // land on the same LUT row in both engines.
      val labels = cb.head.map(_._1)
      val adc = (0 until M).foldLeft(lit(0.0)) { (acc, sub) =>
        acc + element_at(
          map_from_arrays(lit(labels.toArray), lit(lut(sub).toArray)),
          col(s"code_$sub"))
      }
      coded
        .select(col("vec_id"), col("label"), pqCode.cast("long").as("pq_code"),
          adc.as("adc"), fdot2(col("embedding"), lit(qv.toArray)).as("dot"))
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(10)
    }
  }

  /** Q60 — centroid-distance outliers: per label, the 5 vectors LEAST
    * aligned with their label centroid (lowest dot). The
    * mislabeled/corrupted-embedding detector of a curation pipeline —
    * vectors far from their class center poison ANN graphs and
    * classifier training, and are exactly the rows a human reviews first.
    * (A norm-based outlier variant is vacuous on this corpus: the
    * embeddings are unit-normalized, ‖x‖² = 1 ± 2e-7.)
    *
    * Exactness chain: centroids are the established decimal-exact label
    * means (same CentSql/centroids pair q42 relies on); per-row dots are
    * sequential double folds against those identical centroid doubles;
    * rank ties break on vec_id. Scale: centroid table is k·dim doubles
    * broadcast back — one scan of the vectors, no vector shuffle; the
    * per-label top-5 window sees only (label, dot) pairs.
    */
  val q60CentroidOutliers: QueryDef = QueryDef.sql(
    "q60_centroid_outliers",
    s"""WITH c0 AS (${CentSql("embeddings", "label")}),
       |d AS (
       |  SELECT e.vec_id, e.label,
       |    ${DotSeqSql("e.embedding", "c.centroid")} AS dot
       |  FROM embeddings e JOIN c0 c ON e.label = c.c_label),
       |r AS (
       |  SELECT vec_id, label, dot,
       |    row_number() OVER (PARTITION BY label ORDER BY dot, vec_id) AS rnk
       |  FROM d)
       |SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, dot
       |FROM r WHERE rnk <= 5
       |ORDER BY label, rnk""".stripMargin) { (s, dir) =>
    import graft.ml.KMeans
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(s, dir, "embeddings")
    val c0 = KMeans.collectCentroids(KMeans.centroids(
      emb.withColumn("__k", col("label")), "__k"))
    val cents = s.createDataFrame(c0).toDF("c_label", "centroid")
    val d = emb.join(broadcast(cents), col("label") === col("c_label"))
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.dot(col("embedding"), col("centroid")).as("dot"))
    d.withColumn("rnk",
        row_number().over(Window.partitionBy("label").orderBy(col("dot"), col("vec_id")))
          .cast(LongType))
      .filter(col("rnk") <= 5)
      .select(col("label"), col("rnk"), col("vec_id"), col("dot"))
      .orderBy("label", "rnk")
  }

  val all: Seq[QueryDef] = Seq(
    q26VectorMean, q27DotTopk, q28EmbeddingNeardup, q34AnnLsh, q42AnnIvf,
    q46EmbeddingNeardupLsh, q53AnnRecall, q58AnnPq, q60CentroidOutliers)
}
