package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding/vector operators over the `embeddings` table: element-wise
  * vector aggregation (SURVEY A1 VectorMean) and similarity search
  * (LLM-pipeline brute-force top-k + near-dup pairs).
  *
  * Float parity strategy: embedding elements are float32; each is cast to
  * DECIMAL(18,9) (exact to within one decimal ulp of the shortest double
  * repr, identical in both engines), after which every sum/product is exact
  * decimal arithmetic — order-independent, so shuffles and partial aggs
  * can't perturb results.
  */
object VectorOps {

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
    Tables(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy(col("label"), col("idx").cast(LongType).as("idx"))
      .agg((sum(col("v").cast(DecimalType(18, 9))).cast(DecimalType(38, 9))
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
       |SELECT e.vec_id, e.label, ${DotOutSql("e.embedding", "q.qv")} AS dot
       |FROM embeddings e, q
       |WHERE e.vec_id <> 0
       |ORDER BY dot DESC, vec_id
       |LIMIT 20""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), dotOut("embedding", "qv").as("dot"))
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
       |  ${DotOutSql("a.embedding", "b.embedding")} AS dot
       |FROM embeddings a
       |JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${DotDecSql("a.embedding", "b.embedding")} > CAST(0.25 AS DECIMAL(38,18))
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("label"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      // codegen'd double prefilter: |double dot − exact decimal dot| < ~3e-8
      // for dim-64 unit-scale vectors, so a 1e-6 margin can't change the
      // survivor set; the expensive exact-decimal dot runs only on survivors.
      .filter(org.apache.spark.sql.graft.VectorExpressions.float_dot(col("ea"), col("eb")) > 0.25 - 1e-6)
      .withColumn("dot_exact", dotDec("ea", "eb"))
      .filter(col("dot_exact") > lit("0.25").cast(DecimalType(38, 18)))
      .select(col("id_a"), col("id_b"), col("label"), col("dot_exact").cast(DoubleType).as("dot"))
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

  private def bucketSpark: String = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val arr = p.mkString("array(", ", ", ")")
      s"(CASE WHEN aggregate(zip_with(embedding, $arr, " +
        "(x, pc) -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) * pc AS DECIMAL(30,9))), " +
        s"CAST(0 AS DECIMAL(38,9)), (a, b) -> CAST(a + b AS DECIMAL(38,9))) > 0 " +
        s"THEN ${1L << j}L ELSE 0L END)"
    }
    bits.mkString("(", " + ", ")")
  }

  private def bucketDuck: String = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val arr = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum([CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(18,9)) * ($arr)[i] " +
        s"for i in range(1, 65)]) > 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END)"
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
       |SELECT e.vec_id, e.label, e.bucket, ${DotOutSql("e.embedding", "p.qv")} AS dot
       |FROM b e JOIN probes p ON e.bucket = p.pb
       |WHERE e.vec_id <> 0
       |ORDER BY dot DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
      .withColumn("bucket", expr(bucketSpark))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("bucket").as("qb"))
    val probes = q
      .select(col("qv"), col("qb"), explode(lit(probeMasks.toArray)).as("mask"))
      .select(col("qv"), expr("qb ^ mask").as("pb"))
    emb.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), col("bucket") === col("pb"))
      .select(col("vec_id"), col("label"), col("bucket"), dotOut("embedding", "qv").as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(10)
  }

  /** Q42 — IVF approximate nearest neighbours: k-means coarse quantization
    * (graft.ml.KMeans — labeled warm start + one Lloyd refinement), then
    * probe only the query's cell and rank it exactly.
    *
    * Cross-engine determinism: centroids are decimal-exact means cast to
    * double (identical), distances are sequential left-to-right double
    * folds (identical IEEE), argmin ties break on cell id. The assignment
    * reduction groups on vec_id only — the embedding rides as an
    * aggregation payload, NOT in the shuffle key. At scale the assignment
    * is the ingest-time map; the probe reads one cell — the IVF complement
    * to q34's hyperplane buckets.
    */
  val q42AnnIvf: QueryDef = {
    def CentSql(rel: String, key: String) =
      s"""SELECT $key AS c_label, list(m ORDER BY idx) AS centroid
         |  FROM (
         |    SELECT $key, idx,
         |      CAST(CAST(sum(CAST(CAST(CAST(v AS DOUBLE) AS VARCHAR) AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS DOUBLE) / count(*) AS m
         |    FROM (SELECT $key, unnest(embedding) AS v, unnest(range(0, len(embedding))) AS idx
         |          FROM $rel)
         |    GROUP BY $key, idx)
         |  GROUP BY $key""".stripMargin
    val DistSql = // sequential fold => bit-identical to Spark's aggregate()
      "list_reduce([(CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]) " +
        "for i in range(1, len(e.embedding)+1)], (a, b) -> a + b)"
    def AssignSql(vecsRel: String, centsRel: String) =
      s"""SELECT vec_id, label, embedding, cell FROM (
         |    SELECT e.vec_id, e.label, e.embedding, c.c_label AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $DistSql, c.c_label) AS rn
         |    FROM $vecsRel e, $centsRel c) t
         |  WHERE rn = 1""".stripMargin
    QueryDef.sql(
      "q42_ann_ivf",
      s"""WITH c0 AS (${CentSql("embeddings", "label")}),
         |a0 AS (${AssignSql("embeddings", "c0")}),
         |c1 AS (${CentSql("a0", "cell")}),
         |a1 AS (${AssignSql("a0", "c1")}),
         |q AS (SELECT embedding AS qv, cell AS qcell FROM a1 WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, e.cell, ${DotOutSql("e.embedding", "q.qv")} AS dot
         |FROM a1 e, q
         |WHERE e.cell = q.qcell AND e.vec_id <> 0
         |ORDER BY dot DESC, vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val assigned = graft.ml.KMeans.lloyd(emb, "label", steps = 2)
      val q = assigned.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("cell").as("qcell"))
      assigned.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("cell") === col("qcell"))
        .select(col("vec_id"), col("label"), col("cell"), dotOut("embedding", "qv").as("dot"))
        .orderBy(col("dot").desc, col("vec_id"))
        .limit(10)
    }
  }

  val all: Seq[QueryDef] = Seq(
    q26VectorMean, q27DotTopk, q28EmbeddingNeardup, q34AnnLsh, q42AnnIvf)
}
