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

  /** q53 exact-arm persist knob for the round-10 A/B (tools/Q53Ab):
    * persisting the 80-row post-rank exact result measured
    * INDISTINGUISHABLE from recomputing it per arm (interleaved 5-rep
    * A/B: persist 4.35 s median / 3.17 min vs no-persist 4.28 / 3.58 on
    * a hot box — within run noise), so the default stays false and the
    * plan stays persist-free, consistent with the round-4 finding that
    * q53-family persists don't pay. Flipped only by the measurement tool.
    */
  @volatile private[graft] var persistExactArm = false

  /** q53 top-10 ranking form: true = bounded topk_by_score aggregate
    * (map-side partials, ≤10 rows per query per partition reach the
    * exchange), false = the row_number window twin (full candidate
    * shuffle + sort). Same rows either way — (dot DESC, vec_id ASC)
    * selection; the knob exists for tools/TopKAb's interleaved A/B.
    * Measured (r10, 5 interleaved reps, sf0.1): pairwise deltas sum to
    * -0.05 s — indistinguishable at this SF. Agg kept as default for
    * the scale path: the exchange carries O(queries·k·partitions) rows
    * instead of the corpus×8 candidate stream.
    */
  @volatile private[graft] var topKAggTop10 = true

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

  /** Fixed random-hyperplane family for sign-LSH: 16 planes × 64 integer
    * coefficients in [-9, 9], generated by a deterministic splitmix-style
    * bit-mix hash and spliced into both engines as literals. The hash
    * matters: the previous affine formula `((j*97 + i*31) % 19) - 9` made
    * every plane a cyclic shift of one period-19 sequence, so the 16 sign
    * bits were strongly correlated (1337 occupied buckets for 2000 sf0.1
    * vectors, ~10× the collision rate of independent planes) — measured
    * recall@10 of the multiprobe search fell to 0.04. Independent planes
    * spread the same corpus over ~1900 buckets and the margin-directed
    * multiprobe below reaches recall 0.56–0.63 reading 25–28% of the
    * corpus at the default operating point (see [[probeBuckets]]).
    * 16 planes → 2^16 buckets: at 100 TB each probed bucket holds ~N/65536
    * rows.
    */
  private def mix64(v: Long): Long = {
    var x = v * 0x9E3779B97F4A7C15L
    x ^= (x >>> 31); x *= 0xBF58476D1CE4E5B9L; x ^= (x >>> 27)
    x
  }
  private val planes: Seq[Seq[Int]] =
    Seq.tabulate(16, 64)((j, i) =>
      java.lang.Long.remainderUnsigned(mix64((j * 64 + i).toLong), 19).toInt - 9)

  /** Test access to the plane family: the margin-parity spec re-derives the
    * per-query (|dot|, j) total order in BOTH engines from these exact
    * coefficients — multiprobe correctness rests on that order being
    * bit-identical, a strictly stronger contract than the sign equality the
    * buckets need, so it gets its own spec instead of failing as an opaque
    * q34 hash mismatch.
    */
  private[graft] def lshPlanes: Seq[Seq[Int]] = planes
  private[graft] def lshProbeBits: Int = ProbeBits

  /** Margin-directed multiprobe (Lv et al., "Multi-Probe LSH", VLDB'07):
    * instead of blindly probing every bucket within a fixed hamming radius,
    * probe ALL 2^ProbeBits sign patterns of the ProbeBits hyperplanes the
    * query is CLOSEST to (smallest |dot|) — those are exactly the bits a
    * true near neighbour is likeliest to flip, while the 16-ProbeBits
    * high-margin bits stay pinned. Measured on this corpus (vs hamming-≤2's
    * 137 blind probes at recall 0.04–0.06): 4096 directed probes (the
    * probed-12 economy point) reach recall@10 ≈ 0.24 (sf0.1) / 0.29
    * (sf0.01) reading ~8% of the corpus — nominal read 4096/65536 = 6.25%
    * of buckets, vs IVF's nprobe-2 = 20% read at recall 0.33–0.45 (q53 is
    * the meter for exactly this trade).
    *
    * MEASURED NEGATIVE RESULT (round 8, tools/LshSweep): growing the plane
    * family at a fixed probe budget does NOT buy recall. Because the probe
    * set enumerates every sign pattern of the probed bits, a corpus vector
    * is a candidate iff it agrees with the query on all PINNED bits, so
    * recall/read are functions of the pinned count almost alone:
    *
    *   pinned 4 of 16/18/20 planes → recall 0.24/0.24/0.25 @ ~8% (sf0.1),
    *                                        0.29/0.29/0.33 @ ~7% (sf0.01)
    *   pinned 2 of 16            → recall 0.56 @ 25% (sf0.1)
    *   pinned 6–8 (any planes)   → recall ≤ 0.10 @ ≤2.3%
    *
    * Sharper pins from deeper families (top-4-of-20 margins exceed
    * top-4-of-16) gain ≈ +0.01: this corpus has NO strong neighbours (no
    * pair above cos 0.5 — q53's "hits" sit at θ ≈ 65–75°, per-bit sign
    * agreement ~0.62), so even a high-margin pinned bit flips with ~1/3
    * probability per neighbour and four pins cap recall near 0.25.
    *
    * DEFAULT OPERATING POINT (promoted round 9, from the round-8 sweep):
    * probed 14 of 16 (pinned 2, 16384 probes) — 0.56–0.63 recall @ 25–28%
    * read, strictly DOMINATING the IVF arm (0.33–0.45 @ 20%) on
    * recall-per-read. The operating point is a parameter of the probe
    * derivation ([[probeBuckets]]), not a constant: callers that prefer
    * the economy point pass probeBits = 12 (0.24–0.29 @ ~8% read), and
    * q53 meters BOTH points every run (arms `lsh` = default, `lsh12` =
    * economy) with a `read_frac` column so a geometry change can never
    * silently trade read for recall.
    */
  private val ProbeBits = 14

  /** One FloatVectorDot column per hyperplane — the SAME expression the
    * bucket derivation uses, so driver-side sign/margin math starts from
    * bit-identical doubles.
    */
  private def planeDotCols: Seq[org.apache.spark.sql.Column] =
    planes.map(p => fdot2(col("embedding"), lit(p.map(_.toFloat).toArray)))

  /** Driver-side probe derivation from the query's 16 plane dots: the
    * bucket (sign bits) and the 2^ProbeBits probe buckets obtained by
    * flipping every subset of the ProbeBits lowest-|margin| bits. Total
    * order (|dot|, j) ties identically in both engines because the dots
    * are bit-identical doubles.
    */
  private def probeBuckets(planeDots: Seq[Double],
      probeBits: Int = ProbeBits): Seq[Long] = {
    val qb = planeDots.zipWithIndex
      .map { case (d, j) => if (d > 0d) 1L << j else 0L }.sum
    val bits = planeDots.map(math.abs).zipWithIndex
      .sortBy { case (a, j) => (a, j) }.take(probeBits).map(_._2)
    (0 until (1 << probeBits)).map { m =>
      qb ^ bits.zipWithIndex.map { case (b, i) => ((m >> i) & 1).toLong << b }.sum
    }
  }

  /** Oracle twin of the margin list: `[abs(dot(qv, plane_j)) for j]` as a
    * 16-element DOUBLE list literal-expression over `qvExpr`.
    */
  private def MarginsDuck(qvExpr: String): String =
    planes.map(p =>
      s"abs(list_dot_product(CAST($qvExpr AS DOUBLE[]), CAST(${p.mkString("[", ", ", "]")} AS DOUBLE[])))")
      .mkString("[", ", ", "]")

  /** Oracle twin of [[probeBuckets]] as CTE SQL: from a relation `srcRel`
    * with columns (qid, qv, qb), derive `probes(qid, qv, pb)` — the same
    * sort by (margin, j), the same subset enumeration, pure integer bucket
    * arithmetic after the identical-double sort.
    */
  private def ProbesDuckCtes(srcRel: String, probeBits: Int = ProbeBits,
      suffix: String = ""): String =
    s"""pm$suffix AS (SELECT qid, qv, qb, ${MarginsDuck("qv")} AS ms FROM $srcRel),
       |pbits$suffix AS (
       |  SELECT qid, list(j ORDER BY ms[j+1], j)[1:$probeBits] AS bs,
       |    any_value(qb) AS qb, any_value(qv) AS qv
       |  FROM pm$suffix, unnest(range(0, 16)) AS t(j)
       |  GROUP BY qid, ms),
       |probes$suffix AS (
       |  SELECT qid, qv, xor(qb, list_reduce(list_prepend(0::BIGINT,
       |      [(((msk >> i) & 1)::BIGINT << bs[i+1]) for i in range(0, $probeBits)]),
       |      (a, b) -> a + b)) AS pb
       |  FROM pbits$suffix, unnest(range(0, ${1 << probeBits})) AS t(msk))""".stripMargin

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

  /** Q28 — same-label embedding near-duplicate pairs via BANDED sign-LSH
    * candidates (q46's generic blocker) with the label as an ADDITIONAL
    * band key. Candidates are pairs sharing (band, band-bits, label) for
    * any of the 4 bands; survivors verify with the exact sequential-double
    * dot at > 0.25.
    *
    * This replaces the round-≤6 within-label all-pairs join — a
    * low-cardinality blocking key is a quadratic blow-up at scale (~10
    * labels ⇒ ~N²/10 candidate dots); the (band, bk, label) shuffle key is
    * sub-quadratic by the same argument as q46, and the label constraint
    * rides the band key for free. Measured at sf0.01: 2.9k candidate pairs
    * (vs 12.2k all same-label pairs), finding 128 of the 293 same-label
    * dot>0.25 pairs — the identical ~44% S-curve recall q46 shows on the
    * unconstrained problem, at the same plan shape.
    */
  val q28EmbeddingNeardup: QueryDef = QueryDef.sql(
    "q28_embedding_neardup",
    s"""WITH b AS (SELECT vec_id, label, embedding, $bucketDuck AS bucket FROM embeddings),
       |bands AS (
       |  SELECT vec_id, label, j AS band, (bucket >> (4*j)) & 15 AS bk
       |  FROM b, unnest([0, 1, 2, 3]) AS t(j)),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b, x.label
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bk = y.bk AND x.label = y.label
       |      AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, label, dot FROM (
       |  SELECT c.id_a, c.id_b, c.label,
       |    ${DotSeqSql("ea.embedding", "eb.embedding")} AS dot
       |  FROM cand c
       |  JOIN b ea ON ea.vec_id = c.id_a
       |  JOIN b eb ON eb.vec_id = c.id_b)
       |WHERE dot > 0.25
       |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
      .withColumn("bucket", bucketCol)
      .select("vec_id", "label", "embedding", "bucket")
    val bands = emb
      .select(col("vec_id"), col("label"), col("bucket"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bk", expr("shiftright(bucket, 4*band) & 15"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        col("x.label").as("label"))
      .distinct()
    cand
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      // the threshold compares the SAME sequential-double dot in both
      // engines (0.25 is binary-exact), so the survivor set is identical —
      // one codegen'd FloatVectorDot per candidate, no decimal second pass
      .withColumn("dot", fdot("ea", "eb"))
      .filter(col("dot") > 0.25)
      .select(col("id_a"), col("id_b"), col("label"), col("dot"))
      .orderBy("id_a", "id_b")
  }


  /** Q34 — bucketed approximate nearest neighbours over the PERSISTED
    * bucket-partitioned layout: 16-plane sign-LSH bucket per vector
    * (written once as a `partitionBy("bucket")` parquet layout —
    * [[graft.sources.BucketedEmbeddings]]), margin-directed multiprobe
    * around the query's bucket, exact max-inner-product ranking of the
    * probed members.
    *
    * This is the sublinear scale path q27's brute force motivates, and the
    * layout makes it REAL rather than claimed: the probe set is computed on
    * the driver (16 doubles → 2^ProbeBits bucket ids) and lands in the scan
    * as a partition IN-filter, so the read is probed-directories only —
    * PartitionFilters in the plan, asserted by PlanSpec — not a full scan
    * plus filter. At 100 TB each of the 65536 partitions holds ~N/65536
    * rows and the default probed-14/pinned-2 probe reads 16384 of them
    * (25% nominal — the round-8 sweep-measured dominant point, 0.56–0.63
    * recall; pass probeBits = 12 to [[probeBuckets]] for the ~6%-read
    * economy point at 0.24–0.29); the layout write is the one-time ingest
    * cost every ANN index pays.
    *
    * The reference analogue is LmdbRDD's key-range layout-for-access-pattern
    * (caffe-distri LmdbRDD.scala:41-95 — partitions aligned to how reads
    * arrive); here the access pattern is bucket probes, so bucket is the
    * partition key.
    */
  val q34AnnLsh: QueryDef = QueryDef.sql(
    "q34_ann_lsh",
    s"""WITH b AS (SELECT vec_id, label, embedding, $bucketDuck AS bucket FROM embeddings),
       |q AS (SELECT 0 AS qid, embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0),
       |${ProbesDuckCtes("q")}
       |SELECT e.vec_id, e.label, e.bucket, ${DotSeqSql("e.embedding", "p.qv")} AS dot
       |FROM b e JOIN probes p ON e.bucket = p.pb
       |WHERE e.vec_id <> 0
       |ORDER BY dot DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val layout = graft.sources.BucketedEmbeddings(s, dir)
    // one tiny pushed-filter job fetches the query vector and its 16 plane
    // dots — evaluated by the same codegen'd FloatVectorDot the stored
    // buckets were derived with, so driver sign/margin math is bit-exact
    val q = Tables(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding") +: planeDotCols: _*).head
    val qv = q.getSeq[Float](0).toArray
    val probes = probeBuckets((1 to 16).map(q.getDouble))
    layout
      .filter(col("vec_id") =!= 0 &&
        col("bucket").isin(probes.map(_.toInt): _*))
      .select(col("vec_id"), col("label"),
        col("bucket").cast(LongType).as("bucket"),
        fdot2(col("embedding"), lit(qv)).as("dot"))
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
  /** Just the k-means training + assignment CTE chain (`c0/a0/c1/a1`, no
    * query probes) — shared with q74's SemDeDup oracle in DedupOps.
    */
  private[graft] def IvfAssignCtes: String =
    s"""c0 AS (${CentSql("embeddings", "label")}),
       |a0 AS (${AssignSql("embeddings", "c0")}),
       |c1 AS (${CentSql("a0", "cell")}),
       |a1 AS (${AssignSql("a0", "c1")})""".stripMargin

  private def IvfCtes(nQueries: Int): String =
    s"""$IvfAssignCtes,
       |q AS (SELECT vec_id, embedding FROM a1 WHERE vec_id < $nQueries),
       |qprobe AS (
       |  SELECT qid, qv, pcell FROM (
       |    SELECT e.vec_id AS qid, e.embedding AS qv, c.c_label AS pcell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $DistSql, c.c_label) AS rn
       |    FROM q e, c1 c) t
       |  WHERE rn <= 2)""".stripMargin

  /** PQ shared oracle pieces (q58 + q53's pq arm): per-subspace quantizer
    * codes for the corpus rows matching `corpusPred`, per-query subvector
    * LUTs, and the ADC score per (qid, vec_id). Requires upstream CTEs
    * `c0` (label centroids) and `pqq(qid, qv)` (the query set). A corpus
    * code row joins the LUT row of EVERY query with that (sub, code), so
    * the chain is multi-query by construction.
    */
  private val PqSubDistDuck =
    "list_reduce([(CAST(e.embedding[8*s.sub+i] AS DOUBLE) - c.centroid[8*s.sub+i]) * " +
      "(CAST(e.embedding[8*s.sub+i] AS DOUBLE) - c.centroid[8*s.sub+i]) " +
      "for i in range(1, 9)], (a, b) -> a + b)"
  private def PqCtes(corpusPred: String): String =
    s"""pqcodes AS (
       |  SELECT vec_id, label, sub, cl AS code FROM (
       |    SELECT e.vec_id, e.label, s.sub, c.c_label AS cl,
       |      row_number() OVER (PARTITION BY e.vec_id, s.sub
       |        ORDER BY $PqSubDistDuck, c.c_label) AS rn
       |    FROM embeddings e, unnest(range(0, 8)) AS s(sub), c0 c
       |    WHERE $corpusPred) t
       |  WHERE rn = 1),
       |pqlut AS (
       |  SELECT q.qid, s.sub, c.c_label,
       |    list_dot_product(CAST(q.qv[8*s.sub+1 : 8*s.sub+8] AS DOUBLE[]),
       |      c.centroid[8*s.sub+1 : 8*s.sub+8]) AS lv
       |  FROM pqq q, unnest(range(0, 8)) AS s(sub), c0 c),
       |pqadc AS (
       |  SELECT l.qid, cd.vec_id, min(cd.label) AS label,
       |    CAST(list_reduce(list_prepend(0::BIGINT,
       |      list(cd.code * (1::BIGINT << (4*cd.sub)) ORDER BY cd.sub)),
       |      (a, b) -> a + b) AS BIGINT) AS pq_code,
       |    list_reduce(list_prepend(0.0, list(l.lv ORDER BY cd.sub)),
       |      (a, b) -> a + b) AS adc
       |  FROM pqcodes cd JOIN pqlut l ON cd.sub = l.sub AND cd.code = l.c_label
       |  GROUP BY l.qid, cd.vec_id)""".stripMargin

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
      // codebooks load from the per-corpus centroid layout (trained once,
      // sources/IvfCentroids — the values are the identical decimal-exact
      // tables this query used to train inline); the assignment stays a
      // map-only argmin fold, which round 4 measured cheaper than either
      // the crossJoin+exchange form or persisting embedding-carrying rows
      val (_, c1) = graft.sources.IvfCentroids(s, dir)
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
    * LSH S-curve (here ~43% recall at dot > 0.25 examining ~24% of the
    * pair space on this data; production tuning raises planes-per-band and
    * band count with the same plan shape). Compare q28: the same banding
    * with the label as an extra key finds the same ~44% of the same-label
    * pairs from ~2.9k candidates.
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

  /** Q53 — ANN quality gate: recall@10 of the approximate searches
    * (q34 multiprobe sign-LSH at its two operating points, q42 nprobe-2
    * IVF, q58 PQ-ADC with exact re-rank) against the exact scan, over an
    * 8-query held-out set, computed inside the engine. A production
    * ANN deployment ships with exactly this query — recall/read-fraction
    * is the tunable and this is its meter (re-run after changing
    * planes/probes/nprobe; at 100 TB the query sample grows, the shape
    * doesn't). One row per (method, query) so the distribution is
    * visible, not just the mean, and each row carries `read_frac` —
    * candidates whose full vector was read for exact ranking, over the
    * corpus size — so BOTH axes of the trade are oracle-checked: a
    * geometry change can never silently buy recall with unmetered read
    * (for pq the read is the 100-row re-rank set; the ADC pass touches
    * codes, not vectors).
    *
    * The rows also tell the structural story on this corpus: IVF's
    * learned cells track the label clusters the data actually has (recall
    * ≈0.33–0.45 reading nprobe/k = 20%), the `lsh` arm at the promoted
    * q34 default (probed 14 / pinned 2 — the round-8 tools/LshSweep
    * -measured dominant point) reaches ≈0.56–0.63 reading 25–28%, beating
    * IVF on recall-per-read, and the `lsh12` economy point (probed 12 /
    * pinned 4) reaches ≈0.24–0.29 reading ~8%. The meter is what measured
    * the round-6 hamming-2 scheme at 0.04 and justified replacing it, and
    * what showed deeper plane families gain ≈+0.01 at a fixed probe
    * budget (negative result, ProbeBits doc).
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
       |${ProbesDuckCtes("lq")},
       |${ProbesDuckCtes("lq", probeBits = 12, suffix = "12")},
       |corpusn AS (SELECT count(*) AS n FROM corpus),
       |lsh AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT p.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "p.qv")} DESC, e.vec_id) AS rn
       |    FROM corpus e JOIN probes p ON e.bucket = p.pb) t
       |  WHERE rn <= 10),
       |lshscan AS (
       |  SELECT p.qid, count(*) AS n_scanned
       |  FROM corpus e JOIN probes p ON e.bucket = p.pb GROUP BY p.qid),
       |lsh12 AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT p.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "p.qv")} DESC, e.vec_id) AS rn
       |    FROM corpus e JOIN probes12 p ON e.bucket = p.pb) t
       |  WHERE rn <= 10),
       |lsh12scan AS (
       |  SELECT p.qid, count(*) AS n_scanned
       |  FROM corpus e JOIN probes12 p ON e.bucket = p.pb GROUP BY p.qid),
       |ivf AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT p.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "p.qv")} DESC, e.vec_id) AS rn
       |    FROM a1 e JOIN qprobe p ON e.cell = p.pcell
       |    WHERE e.vec_id >= $RecallQueries) t
       |  WHERE rn <= 10),
       |ivfscan AS (
       |  SELECT p.qid, count(*) AS n_scanned
       |  FROM a1 e JOIN qprobe p ON e.cell = p.pcell
       |  WHERE e.vec_id >= $RecallQueries GROUP BY p.qid),
       |pqq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |        WHERE vec_id < $RecallQueries),
       |${PqCtes(s"e.vec_id >= $RecallQueries")},
       |pqtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id) AS rn
       |    FROM pqadc) t
       |  WHERE rn <= 100),
       |pqscan AS (
       |  SELECT qid, count(*) AS n_scanned FROM pqtop GROUP BY qid),
       |pq AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT p.qid, e.vec_id,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY ${DotSeqSql("e.embedding", "q.qv")} DESC, e.vec_id) AS rn
       |    FROM pqtop p
       |    JOIN embeddings e ON e.vec_id = p.vec_id
       |    JOIN pqq q ON q.qid = p.qid) t
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
       |    count(ivf.vec_id) AS n_overlap,
       |    coalesce(min(s.n_scanned), 0) AS n_scanned
       |  FROM exact LEFT JOIN ivf
       |    ON exact.qid = ivf.qid AND exact.vec_id = ivf.vec_id
       |  LEFT JOIN ivfscan s ON exact.qid = s.qid
       |  GROUP BY exact.qid
       |  UNION ALL
       |  SELECT 'lsh' AS method, exact.qid,
       |    count(lsh.vec_id) AS n_overlap,
       |    coalesce(min(s.n_scanned), 0) AS n_scanned
       |  FROM exact LEFT JOIN lsh
       |    ON exact.qid = lsh.qid AND exact.vec_id = lsh.vec_id
       |  LEFT JOIN lshscan s ON exact.qid = s.qid
       |  GROUP BY exact.qid
       |  UNION ALL
       |  SELECT 'lsh12' AS method, exact.qid,
       |    count(lsh12.vec_id) AS n_overlap,
       |    coalesce(min(s.n_scanned), 0) AS n_scanned
       |  FROM exact LEFT JOIN lsh12
       |    ON exact.qid = lsh12.qid AND exact.vec_id = lsh12.vec_id
       |  LEFT JOIN lsh12scan s ON exact.qid = s.qid
       |  GROUP BY exact.qid
       |  UNION ALL
       |  SELECT 'pq' AS method, exact.qid,
       |    count(pq.vec_id) AS n_overlap,
       |    coalesce(min(s.n_scanned), 0) AS n_scanned
       |  FROM exact LEFT JOIN pq
       |    ON exact.qid = pq.qid AND exact.vec_id = pq.vec_id
       |  LEFT JOIN pqscan s ON exact.qid = s.qid
       |  GROUP BY exact.qid)
       |SELECT method, qid, n_overlap, n_overlap / 10 AS recall,
       |  n_scanned / (SELECT n FROM corpusn) AS read_frac
       |FROM hits
       |ORDER BY method, qid""".stripMargin) { (s, dir) =>
    import graft.ml.KMeans
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(s, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= RecallQueries)
    val queries = emb.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // per-query top-10 via the bounded topk_by_score aggregate: map-side
    // partials reduce each partition to ≤10 rows per query BEFORE the
    // exchange, where the window form shuffles and sorts every candidate
    // row (the exact arm's is corpus×8). Selection order (dot DESC,
    // vec_id ASC) is identical to the window's — same rows out. The
    // window twin stays behind the knob for the interleaved A/B
    // (tools/TopKAb); flip only by the measurement tool.
    def top10(cands: org.apache.spark.sql.DataFrame) =
      if (topKAggTop10) {
        cands.groupBy("qid")
          .agg(org.apache.spark.sql.graft.TopK
            .topk_by_score(fdot("embedding", "qv"), col("vec_id"), 10).as("tk"))
          .select(col("qid"), explode(col("tk")).as("h"))
          .select(col("qid"), col("h.id").as("vec_id"))
      } else {
        val w = Window.partitionBy("qid")
          .orderBy(fdot("embedding", "qv").desc, col("vec_id"))
        cands.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select("qid", "vec_id")
      }
    // exact baseline: corpus × 8 broadcast queries, ranked per query;
    // referenced by all four arms' overlap joins. NOT persisted by
    // default: ReuseExchange already dedups the shuffle under the window,
    // and the interleaved A/B (tools/Q53Ab, knob above) measured the
    // persist within noise of recompute — the round-4 lesson that
    // q53-family persists don't pay extends to this 80-row result.
    val exactBase = top10(corpus.crossJoin(broadcast(queries)))
    val exact =
      if (persistExactArm)
        exactBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else exactBase
    // q34 arm: margin-directed multiprobe sign-LSH (distinct probe buckets
    // per query ⇒ a corpus vector matches at most one probe row per query).
    // Probe sets come from the same driver derivation as q34 — one tiny
    // job collects each query's 16 FloatVectorDot plane dots, and the
    // 8 × 2^ProbeBits (qid, bucket) pairs broadcast as a bare pair table;
    // query vectors rejoin by qid only for the ranking dot.
    val withBucket = emb.withColumn("bucket", bucketCol)
    val qdots = emb.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id") +: planeDotCols: _*).collect()
    val probePairs = qdots.toSeq.flatMap { r =>
      probeBuckets((1 to 16).map(r.getDouble)).map(pb => (r.getLong(0), pb))
    }
    val probesDf = s.createDataFrame(probePairs).toDF("pqid", "pb")
    val candsLsh = withBucket.filter(col("vec_id") >= RecallQueries)
      .join(broadcast(probesDf), col("bucket") === col("pb"))
    val lsh = top10(candsLsh.join(broadcast(queries), col("pqid") === col("qid")))
    val lshScan = candsLsh.groupBy(col("pqid").as("qid"))
      .agg(count(lit(1)).as("n_scanned"))
    // lsh12 arm: probed 12 / pinned 4 — the ~8%-read economy point, kept
    // metered next to the promoted default so the recall/read trade stays
    // measured, not remembered
    val probePairs12 = qdots.toSeq.flatMap { r =>
      probeBuckets((1 to 16).map(r.getDouble), probeBits = 12)
        .map(pb => (r.getLong(0), pb))
    }
    val probesDf12 = s.createDataFrame(probePairs12).toDF("pqid", "pb")
    val candsLsh12 = withBucket.filter(col("vec_id") >= RecallQueries)
      .join(broadcast(probesDf12), col("bucket") === col("pb"))
    val lsh12 = top10(candsLsh12.join(broadcast(queries), col("pqid") === col("qid")))
    val lsh12Scan = candsLsh12.groupBy(col("pqid").as("qid"))
      .agg(count(lit(1)).as("n_scanned"))
    // q42 arm: nprobe-2 IVF over the collected-centroid assignment; the
    // codebooks come from the shared per-corpus layout (IvfCentroids),
    // leaving the map-only a1 fold as this arm's only corpus pass
    val (c0, c1) = graft.sources.IvfCentroids(s, dir)
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
    val candsIvf = a1.filter(col("vec_id") >= RecallQueries)
      .join(broadcast(probeSet), col("cell") === col("pcell"))
    val ivf = top10(candsIvf)
    val ivfScan = candsIvf.groupBy("qid").agg(count(lit(1)).as("n_scanned"))
    // pq arm: per-query ADC over q58's label-centroid sub-codebooks,
    // top-100 by ADC, re-ranked by the exact dot. LUTs are driver math per
    // (query, subspace) and broadcast as 8 literal maps keyed
    // (qid*16 + code), so ONE pass over the coded corpus scores all 8
    // queries — the scan stays code-only until the 100-row re-rank.
    val M = 8; val D = 8
    require(c0.forall { case (l, _) => l >= 0 && l < 16 },
      s"adc map keys pack labels into 4-bit fields; got ${c0.map(_._1).mkString(",")}")
    val cbQ = (0 until M).map(sub =>
      c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
    val pqLabels = cbQ.head.map(_._1)
    def lutFor(qv: Seq[Float]): Seq[Seq[Double]] = (0 until M).map { sub =>
      cbQ(sub).map { case (_, c) =>
        var acc = 0.0
        var i = 0
        while (i < D) { acc += qv(sub * D + i).toDouble * c(i); i += 1 }
        acc
      }
    }
    val lutsByQ = qvs.toSeq.map { case (qid, qv) => (qid, lutFor(qv)) }
    val adcMaps = (0 until M).map { sub =>
      map_from_arrays(
        lit(lutsByQ.flatMap { case (qid, _) => pqLabels.map(l => qid * 16 + l) }.toArray),
        lit(lutsByQ.flatMap { case (_, luts) => luts(sub) }.toArray))
    }
    val codedC = corpus.select(Seq(col("vec_id"), col("embedding")) ++
      (0 until M).map(sub => org.apache.spark.sql.graft.VectorExpressions
        .nearest_centroid(col("embedding"), cbQ(sub), offset = sub * D)
        .as(s"code_$sub")): _*)
    val qidDf = s.createDataFrame(qvs.toSeq.map(q => Tuple1(q._1))).toDF("qid")
    val adcCol = (0 until M).foldLeft(lit(0.0)) { (acc, sub) =>
      acc + element_at(adcMaps(sub), col("qid") * 16 + col(s"code_$sub"))
    }
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))
    val pqCand = codedC.crossJoin(broadcast(qidDf))
      .withColumn("adc", adcCol)
      .withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= 100)
      .select("qid", "vec_id", "embedding")
    val pqArm = top10(pqCand.join(broadcast(queries), "qid"))
    // pq's full-vector read is the 100-row re-rank set, not the code-only
    // ADC pass — read_frac meters what pays for exact dots, per the q58 doc
    val pqScan = pqCand.groupBy("qid").agg(count(lit(1)).as("n_scanned"))
    // corpus size for read_frac: one tiny count job over the pushed-down
    // scan; the denominator is a constant of the run, not a per-row join
    val corpusN = corpus.count()
    def arm(name: String, approx: org.apache.spark.sql.DataFrame,
        scanned: org.apache.spark.sql.DataFrame) = {
      val a = approx.withColumnRenamed("qid", "aqid")
        .withColumnRenamed("vec_id", "hit")
      exact.join(a,
          col("qid") === col("aqid") && col("vec_id") === col("hit"), "left")
        .groupBy(col("qid"))
        .agg(count(col("hit")).as("n_overlap"))
        .join(scanned.withColumnRenamed("qid", "sqid"),
          col("qid") === col("sqid"), "left")
        .select(lit(name).as("method"), col("qid"), col("n_overlap"),
          coalesce(col("n_scanned"), lit(0L)).as("n_scanned"))
    }
    arm("ivf", ivf, ivfScan).unionAll(arm("lsh", lsh, lshScan))
      .unionAll(arm("lsh12", lsh12, lsh12Scan))
      .unionAll(arm("pq", pqArm, pqScan))
      .withColumn("recall", col("n_overlap") / lit(10))
      .withColumn("read_frac", col("n_scanned") / lit(corpusN))
      .select("method", "qid", "n_overlap", "recall", "read_frac")
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
    * float math per row at scan time. ADC order selects a 100-candidate
    * set, and a RE-RANK pays the exact dot for only those 100 — top-10 by
    * exact dot, the production PQ search shape (ADC bounds what you read,
    * never what you return). The q53 meter's `pq` arm measures this arm's
    * recall next to ivf/lsh.
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
    QueryDef.sql(
      "q58_ann_pq",
      s"""WITH c0 AS (${CentSql("embeddings", "label")}),
         |pqq AS (SELECT 0 AS qid, embedding AS qv FROM embeddings WHERE vec_id = 0),
         |${PqCtes("e.vec_id <> 0")},
         |cand AS (
         |  SELECT a.vec_id, a.label, a.pq_code, a.adc
         |  FROM pqadc a
         |  ORDER BY adc DESC, a.vec_id
         |  LIMIT 100)
         |SELECT a.vec_id, a.label, a.pq_code, a.adc,
         |  ${DotSeqSql("e.embedding", "q.qv")} AS dot
         |FROM cand a
         |JOIN embeddings e ON e.vec_id = a.vec_id
         |CROSS JOIN pqq q
         |ORDER BY dot DESC, a.vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      // sub-codebook source = the shared per-corpus c0 layout (IvfCentroids)
      val (c0, _) = graft.sources.IvfCentroids(s, dir)
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
      // ADC order narrows the corpus to 100 candidates (codes only — the
      // scan never touches floats), then the RE-RANK pays the exact dot for
      // just those 100: the production PQ shape, where quantization error
      // decides the candidate set but never the final order. Both stages
      // are TakeOrderedAndProject — no shuffle, no full sort.
      coded
        .select(col("vec_id"), col("label"), pqCode.cast("long").as("pq_code"),
          adc.as("adc"), col("embedding"))
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(100)
        .select(col("vec_id"), col("label"), col("pq_code"), col("adc"),
          fdot2(col("embedding"), lit(qv.toArray)).as("dot"))
        .orderBy(col("dot").desc, col("vec_id"))
        .limit(10)
    }
  }

  /** Q64 — IVF+PQ hybrid ANN: the q42 coarse probe deciding WHAT to scan
    * and the q58 ADC deciding HOW each scanned row is scored — composed,
    * this is the production billion-vector search shape (FAISS's IVFADC;
    * Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011). Neither parent exercises the composition: q42 pays an
    * exact float dot for every row in the probed cells, q58 ADC-scans the
    * ENTIRE corpus's codes. Here the query's nprobe-2 nearest cells gate
    * the scan (~nprobe/k of the corpus), the gated rows score as 8
    * 4-bit-code table lookups with no float math, the ADC order selects
    * 100 candidates, and the exact re-rank reads full vectors for only
    * those 100 — at 100 TB the scan cost is nprobe/k × codes-not-vectors,
    * the two multiplicative reductions that make exhaustive search
    * unnecessary at any corpus size.
    *
    * Both codebooks come from the per-corpus [[graft.sources.IvfCentroids]]
    * layout (c1 = coarse cells, c0 sliced = PQ sub-codebooks) — one
    * training, three consumers (q42/q58/q64), the ingest-time split a
    * production deployment uses. Cell assignment is the same map-only
    * native-argmin ingest step as q42 (at scale it is a write-time
    * partition key, making the probe a partition PRUNE like q34's bucket
    * layout — here it lands as a post-scan IN filter on the assigned
    * cell).
    *
    * Determinism chain is the union of the parents': decimal-exact
    * centroids, sequential-fold sub-distances/LUT dots, argmin ties on
    * label, ADC folds in fixed subspace order, both rankings total-ordered
    * by (score DESC, vec_id). The probed-cell set itself is deterministic:
    * driver-side argmin over the collected c1 with the same fold.
    */
  val q64AnnIvfPq: QueryDef = {
    val M = 8 // subspaces
    val D = 8 // dims per subspace
    QueryDef.sql(
      "q64_ann_ivfpq",
      s"""WITH ${IvfCtes(1)},
         |pqq AS (SELECT 0 AS qid, embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probed AS (SELECT a.vec_id FROM a1 a JOIN qprobe p ON a.cell = p.pcell),
         |${PqCtes("e.vec_id <> 0 AND e.vec_id IN (SELECT vec_id FROM probed)")},
         |cand AS (
         |  SELECT a.vec_id, a.label, a.pq_code, a.adc
         |  FROM pqadc a
         |  ORDER BY adc DESC, a.vec_id
         |  LIMIT 100)
         |SELECT a.vec_id, x.cell, a.label, a.pq_code, a.adc,
         |  ${DotSeqSql("e.embedding", "q.qv")} AS dot
         |FROM cand a
         |JOIN embeddings e ON e.vec_id = a.vec_id
         |JOIN a1 x ON x.vec_id = a.vec_id
         |CROSS JOIN pqq q
         |ORDER BY dot DESC, a.vec_id
         |LIMIT 10""".stripMargin) { (s, dir) =>
      import graft.ml.KMeans
      val emb = Tables(s, dir, "embeddings")
      val (c0, c1) = graft.sources.IvfCentroids(s, dir)
      require(c0.forall { case (l, _) => l >= 0 && l < 16 },
        s"pq_code packs labels into 4-bit fields; centroid labels must be in [0,16), " +
          s"got ${c0.map(_._1).mkString(",")}")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head.getSeq[Float](0)
      // coarse stage — identical to q42: map-only argmin assignment, probe
      // cells from driver math over the already-collected centroid table
      val probeCells = KMeans.probeCellsLocal(qv, c1, nprobe = 2)
      val a1 = KMeans.assignWith(emb, c1)
      // fine stage — identical to q58, but over the GATED rows only
      val cb: Seq[Seq[(Long, Seq[Double])]] =
        (0 until M).map(sub => c0.map { case (l, c) => (l, c.slice(sub * D, sub * D + D)) })
      val lut: Seq[Seq[Double]] = (0 until M).map { sub =>
        cb(sub).map { case (_, c) =>
          var acc = 0.0
          var i = 0
          while (i < D) { acc += qv(sub * D + i).toDouble * c(i); i += 1 }
          acc
        }
      }
      def codeCol(sub: Int): org.apache.spark.sql.Column =
        org.apache.spark.sql.graft.VectorExpressions
          .nearest_centroid(col("embedding"), cb(sub), offset = sub * D)
      val coded = a1
        .filter(col("vec_id") =!= 0 && col("cell").isin(probeCells: _*))
        .select(Seq(col("vec_id"), col("cell"), col("label"), col("embedding")) ++
          (0 until M).map(sub => codeCol(sub).as(s"code_$sub")): _*)
      val pqCode = (0 until M).map(sub => col(s"code_$sub") * lit(1L << (4 * sub)))
        .reduce(_ + _)
      val labels = cb.head.map(_._1)
      val adc = (0 until M).foldLeft(lit(0.0)) { (acc, sub) =>
        acc + element_at(
          map_from_arrays(lit(labels.toArray), lit(lut(sub).toArray)),
          col(s"code_$sub"))
      }
      coded
        .select(col("vec_id"), col("cell"), col("label"),
          pqCode.cast("long").as("pq_code"), adc.as("adc"), col("embedding"))
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(100)
        .select(col("vec_id"), col("cell"), col("label"), col("pq_code"), col("adc"),
          fdot2(col("embedding"), lit(qv.toArray)).as("dot"))
        .orderBy(col("dot").desc, col("vec_id"))
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
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(s, dir, "embeddings")
    // the label-mean reference table is the shared c0 layout (IvfCentroids)
    val (c0, _) = graft.sources.IvfCentroids(s, dir)
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

  /** Q73 — hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    * SIGIR'09): q65's BM25 lexical ranking and q27's dense inner-product
    * ranking fused as Σ 1/(60 + rank) over each list's top 50. The
    * RAG-era retrieval staple — lexical catches exact terms dense misses,
    * dense catches paraphrase lexical misses — joining the two ranker
    * families this engine already ships on the corpus convention that
    * `embeddings.vec_id` IS the document's embedding key (doc_id ≡ vec_id,
    * the layout every doc-embedding pipeline stores). The query is the
    * doc-0 embedding for the dense arm and q65's fixed term set for the
    * lexical arm; id 0 is excluded from both candidate lists.
    *
    * Plan shape: each arm is its existing linear scan ending in
    * TakeOrderedAndProject(50) — the global row_number only ever ranks
    * those 50 collected rows (a 1-partition window over a bounded frame,
    * not a global sort), and the fusion is a full-outer join of two
    * 50-row frames. At 100 TB both arms stay one-pass map + top-k; the
    * fusion cost is constant.
    *
    * Determinism: ranks are integers over (quantized score, id) total
    * orders; each RRF term is 1.0/(60+rank) from identical integers —
    * one division and one addition in mirrored association order.
    */
  val q73HybridRrf: QueryDef = QueryDef.sql(
    "q73_hybrid_rrf",
    s"""WITH ${TextOps.Bm25FsCtesSql},
       |lex AS (
       |  SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY score_n9 DESC, doc_id) AS lex_rank
       |    FROM (SELECT doc_id, ${TextOps.Bm25ScoreN9Sql} AS score_n9
       |          FROM f, s WHERE doc_id <> 0) t1) t2
       |  WHERE lex_rank <= 50),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |den AS (
       |  SELECT vec_id, dense_rank FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY dot DESC, vec_id) AS dense_rank
       |    FROM (SELECT e.vec_id, ${DotSeqSql("e.embedding", "q.qv")} AS dot
       |          FROM embeddings e, q WHERE e.vec_id <> 0) t3) t4
       |  WHERE dense_rank <= 50)
       |SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
       |  CAST(COALESCE(l.lex_rank, -1) AS BIGINT) AS lex_rank,
       |  CAST(COALESCE(d.dense_rank, -1) AS BIGINT) AS dense_rank,
       |  COALESCE(1.0 / (60 + l.lex_rank), 0.0) +
       |    COALESCE(1.0 / (60 + d.dense_rank), 0.0) AS rrf
       |FROM lex l FULL JOIN den d ON l.doc_id = d.vec_id
       |ORDER BY rrf DESC, doc_id
       |LIMIT 20""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // both windows rank a frame ALREADY reduced to 50 rows by
    // TakeOrderedAndProject — the "no partition defined" single-partition
    // window is over a constant-bounded input by construction
    val lex = TextOps.bm25Raw(s, dir)
      .filter(col("doc_id") =!= 0)
      .select(col("doc_id"),
        floor(col("score_raw") * lit(1000000000L) + lit(0.5))
          .cast(LongType).as("score_n9"))
      .orderBy(col("score_n9").desc, col("doc_id"))
      .limit(50)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score_n9").desc, col("doc_id")))
          .cast(LongType))
      .select("doc_id", "lex_rank")
    val emb = Tables(s, dir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val den = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), fdot("embedding", "qv").as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(50)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(col("dot").desc, col("vec_id")))
          .cast(LongType))
      .select("vec_id", "dense_rank")
    lex.join(den, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(-1L)).as("dense_rank"),
        (coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(
    q26VectorMean, q27DotTopk, q28EmbeddingNeardup, q34AnnLsh, q42AnnIvf,
    q46EmbeddingNeardupLsh, q53AnnRecall, q58AnnPq, q60CentroidOutliers,
    q64AnnIvfPq, q73HybridRrf)
}
