package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate detection (LLM-pipeline dedup, SURVEY §7.2
  * step 7): MinHash+LSH banding and SimHash, both expressed with fixed
  * integer hash families so the DuckDB oracle reproduces every signature
  * bit-for-bit. Exact-jaccard variants live in TextOps.q21; embedding-space
  * near-dup in VectorOps.q28.
  */
object DedupOps {

  /** q67/span_dedup measurement knob (tools/SpanPersistAb ONLY): persist
    * the twice-consumed `occ` relation instead of recomputing it. Default
    * false — recompute is the production answer (see spanDeduped's scaladoc
    * and the §7b receipt in OPTIMIZATION_r22.md).
    */
  @volatile private[graft] var q67PersistOcc = false

  private val P = 1000000007L
  /** Fixed MinHash family: 16 odd multipliers/offsets (deterministic, spliced
    * into both engines as literals).
    */
  private val hashA: Seq[Long] = (1 to 16).map(i => (i * 2654435761L) % P | 1L)
  private val hashB: Seq[Long] = (1 to 16).map(i => (i * 1315423911L) % P)
  private val ADuck = hashA.mkString("[", "::BIGINT, ", "::BIGINT]")
  private val BDuck = hashB.mkString("[", "::BIGINT, ", "::BIGINT]")

  private val ToksSql = TokensSql("text")

  /** Q31 — MinHash+LSH near-dup candidates with exact-Jaccard verification.
    *
    * Pipeline (identical in both engines): word-bigram shingles → 64-bit
    * rolling hash → 16 minhashes ((a·h+b) mod p) → 4 bands of 4 rows → band
    * hash → candidate pairs sharing ≥1 band → exact Jaccard via the shingle
    * inverted index.
    *
    * Scale notes (the point of LSH): candidate generation joins on
    * (band, band_hash) — sub-quadratic, shuffle keyed by band hash — and the
    * expensive exact verify runs only on candidates. Banding parameters
    * (16 sigs, 4×4) put the S-curve threshold at ≈ (1/4)^(1/4) ≈ 0.71.
    */
  val q31MinhashLsh: QueryDef = QueryDef.sql(
    "q31_minhash_lsh",
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, ${FingerprintSql("s")} AS fp
       |  FROM (SELECT doc_id, $WordBigramsOverT AS bg
       |        FROM (SELECT doc_id, $ToksSql AS t FROM documents)) x, unnest(x.bg) AS u(s)),
       |fps AS (SELECT doc_id, list(fp ORDER BY fp) AS fps FROM sh GROUP BY doc_id),
       |sig AS (
       |  SELECT doc_id,
       |    [list_min([($ADuck[j] * fp + $BDuck[j]) % $P for fp in fps])
       |     for j in range(1, 17)] AS sig
       |  FROM fps),
       |bands AS (
       |  SELECT doc_id, j AS band,
       |    list_reduce(sig[4*j+1 : 4*j+4], (a, b) -> (a * 31 + b) % $P) AS bh
       |  FROM sig, unnest([0, 1, 2, 3]) AS t(j)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id < y.doc_id)
       |SELECT a, b, len(list_intersect(fa.fps, fb.fps)) AS inter,
       |  len(fa.fps) AS na, len(fb.fps) AS nb,
       |  len(list_intersect(fa.fps, fb.fps))
       |    / (len(fa.fps) + len(fb.fps) - len(list_intersect(fa.fps, fb.fps))) AS jaccard
       |FROM cand c
       |JOIN fps fa ON fa.doc_id = c.a
       |JOIN fps fb ON fb.doc_id = c.b
       |ORDER BY a, b""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    // one doc → one sorted distinct fingerprint-set row, built entirely
    // MAP-SIDE: fused ShingleHashes (no bigram strings) → array_distinct
    // (the per-doc DISTINCT, done inside the row) → sort_array. Feeds the
    // signature, the set sizes AND the exact verify (array_intersect) with
    // ZERO shuffles — the shingle relation never leaves its scan tasks
    // (earlier formulations paid a dedup exchange plus a doc_id groupBy)
    val fps = docs
      .select(col("doc_id"), sort_array(array_distinct(
        org.apache.spark.sql.graft.TextExpressions
          .shingle_hashes(tokens("text")))).as("fps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // native MinHashSignature: one tight loop per doc instead of
    // |shingles| × 16 interpreted lambda evaluations; same (a·h+b) mod p
    // minima as the oracle's comprehension.
    val sig = fps.select(col("doc_id"),
      org.apache.spark.sql.graft.SketchExpressions
        .minhash_signature(col("fps"), hashA, hashB, P).as("sig"))
    val bands = sig
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("doc_id"), col("band"),
        expr(s"aggregate(slice(sig, 4*band+1, 4), 0L, (a, b) -> (a * 31 + b) % $P)").as("bh"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // exact verify: |∩| via one sorted-merge per candidate (the sets are
    // sorted distinct by construction — sorted_intersect_count's
    // contract) — map-side per candidate, no inverted-index re-shuffle;
    // the fps relation is small (one row per doc) so both joins
    // broadcast/shuffle O(docs), not O(shingles)
    cand
      .join(fps.select(col("doc_id").as("a"), col("fps").as("fpsa")), "a")
      .join(fps.select(col("doc_id").as("b"), col("fps").as("fpsb")), "b")
      .select(col("a"), col("b"),
        org.apache.spark.sql.graft.SketchExpressions
          .sorted_intersect_count(col("fpsa"), col("fpsb")).as("inter"),
        size(col("fpsa")).as("na"), size(col("fpsb")).as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .select("a", "b", "inter", "na", "nb", "jaccard")
      .orderBy("a", "b")
  }

  /** (doc_id, band, bh) MinHash band keys for every document — exactly
    * q31's banding (same shingles, same hash family, same 4×4 bands),
    * factored for reuse by the streaming near-dup flagger
    * ([[graft.streaming.DocumentStreams.nearDupFlags]]): a band-key
    * collision here IS q31's candidate criterion, so flagging against an
    * index of these keys inherits its no-false-negative contract.
    */
  private[graft] def minhashBands(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), sort_array(array_distinct(
        org.apache.spark.sql.graft.TextExpressions
          .shingle_hashes(tokens("text")))).as("fps"))
      .select(col("doc_id"), org.apache.spark.sql.graft.SketchExpressions
        .minhash_signature(col("fps"), hashA, hashB, P).as("sig"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        expr(s"aggregate(slice(sig, 4*band+1, 4), 0L, (a, b) -> (a * 31 + b) % $P)").as("bh"))

  /** One-row-per-doc variant: the 4 band keys packed as `band * P + bh`
    * longs in a single array column `band_keys` — the map-only shape the
    * streaming flagger tests against its index without an explode.
    */
  private[graft] def minhashBandKeys(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), sort_array(array_distinct(
        org.apache.spark.sql.graft.TextExpressions
          .shingle_hashes(tokens("text")))).as("fps"))
      .select(col("doc_id"), org.apache.spark.sql.graft.SketchExpressions
        .minhash_signature(col("fps"), hashA, hashB, P).as("sig"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, 3), j -> j * ${P}L + " +
          s"aggregate(slice(sig, 4*j+1, 4), 0L, (a, b) -> (a * 31 + b) % $P))")
        .as("band_keys"))

  /** Q32 — SimHash document sketch: 32-bit signature from term-frequency
    * weighted token-hash bits. Map-only (the sketch is the shuffle-free part;
    * hamming-bucketed pair generation is the library follow-up).
    */
  val q32Simhash: QueryDef = QueryDef.sql(
    "q32_simhash",
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(0::BIGINT,
       |    [CASE WHEN list_sum([((th >> j) & 1)*2 - 1 for th in ths]) > 0
       |          THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 32)]),
       |    (a, b) -> a + b) AS simhash,
       |  len(ths) AS n_tokens
       |FROM (
       |  SELECT doc_id, [${FingerprintSql("t0")} for t0 in $ToksSql] AS ths
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graft.SketchExpressions.{simhash32, token_hashes}
    Tables(s, dir, "documents")
      .select(col("doc_id"), token_hashes(tokens("text")).as("ths"))
      .select(col("doc_id"), simhash32(col("ths")).as("simhash"),
        size(col("ths")).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Q39 blocking tables: the 32-bit signature splits into 6 blocks
    * (6,6,5,5,5,5 bits); a pair with hamming ≤ 3 has ≥ 3 clean blocks, so
    * the table keyed on exactly that clean 3-block combination matches —
    * C(6,3) = 20 tables, each key ~16 bits (packed into 6-bit fields).
    * Recall at radius 3 stays EXACT (same output as naive banding), but
    * bucket occupancy drops from N/256 per 8-bit byte-band to ~N/65536 per
    * table: candidate volume shrinks ~50× and, at 100 TB, the per-bucket
    * quadratic term stops being the bottleneck (Manku et al., WWW'07
    * "Detecting Near-Duplicates for Web Crawling" block-permutation
    * scheme).
    */
  private val blockWidths = Seq(6, 6, 5, 5, 5, 5)
  private val blockOffsets = Seq(26, 20, 15, 10, 5, 0)
  private val combos = (0 until 6).combinations(3).toSeq // 20 tables
  private def arrOf(f: Seq[Int] => Int): Seq[Int] = combos.map(f)
  private val offA = arrOf(c => blockOffsets(c(0)))
  private val offB = arrOf(c => blockOffsets(c(1)))
  private val offC = arrOf(c => blockOffsets(c(2)))
  private val mskA = arrOf(c => (1 << blockWidths(c(0))) - 1)
  private val mskB = arrOf(c => (1 << blockWidths(c(1))) - 1)
  private val mskC = arrOf(c => (1 << blockWidths(c(2))) - 1)
  /** Packed 3-block key; `idx` is the 1-based table index expression.
    * Structurally identical in Spark SQL and DuckDB SQL; the array lookup
    * and right-shift are spliced per engine (Spark has shiftright(), not
    * the `>>` operator; DuckDB the reverse).
    */
  private def bhExpr(at: (Seq[Int], String) => String,
      shr: (String, String) => String, idx: String): String = {
    def blk(off: Seq[Int], msk: Seq[Int]) =
      s"(${shr("simhash", at(off, idx))} & ${at(msk, idx)})"
    s"(${blk(offA, mskA)} * 4096 + ${blk(offB, mskB)} * 64 + ${blk(offC, mskC)})"
  }
  private def sparkAt(xs: Seq[Int], idx: String) =
    s"element_at(array(${xs.mkString(",")}), $idx)"
  private def duckAt(xs: Seq[Int], idx: String) =
    s"([${xs.mkString(",")}][$idx])"
  private def sparkShr(x: String, n: String) = s"shiftright($x, $n)"
  private def duckShr(x: String, n: String) = s"($x >> $n)"

  /** Q39 — SimHash near-dup pairs via 3-block combination blocking (see
    * above): candidates are pairs sharing any of the 20 ~16-bit table keys;
    * survivors need hamming ≤ 3. The candidate join is keyed on
    * (table, key) — sub-quadratic with ~65536 buckets per table.
    */
  val q39SimhashNeardup: QueryDef = QueryDef.sql(
    "q39_simhash_neardup",
    s"""WITH sig AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0::BIGINT,
       |      [CASE WHEN list_sum([((th >> j) & 1)*2 - 1 for th in ths]) > 0
       |            THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 32)]),
       |      (a, b) -> a + b) AS simhash
       |  FROM (SELECT doc_id, [${FingerprintSql("t0")} for t0 in $ToksSql] AS ths
       |        FROM documents)),
       |bands AS (
       |  SELECT doc_id, simhash, cid AS band, ${bhExpr(duckAt, duckShr, "cid+1")} AS bh
       |  FROM sig, unnest(range(0, 20)) AS t(cid)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |    bit_count(xor(x.simhash, y.simhash)) AS hamming
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 3)
       |SELECT a, b, hamming
       |FROM cand
       |ORDER BY a, b""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graft.SketchExpressions.{simhash32, token_hashes}
    // SIGNATURE CLUSTERING before banding (the production simhash-dedup
    // layout): identical signatures collapse to one cluster row, so the
    // band join runs over distinct signatures — on dup-heavy data that
    // shrinks the quadratic term by (distinct/total)² (here 2534/5000 at
    // sf0.1 → ~4× fewer emissions) and at 100 TB it is what keeps
    // exact-dup storms out of the join entirely. Member pairs are expanded
    // AFTER the hamming verify: cross-cluster pairs via a double explode,
    // intra-cluster pairs (hamming 0) via an in-list comprehension. The
    // two sets are disjoint and each doc pair occurs under exactly one
    // signature pair, so no final dedup pass is needed.
    val sig = Tables(s, dir, "documents")
      .select(col("doc_id"), simhash32(token_hashes(tokens("text"))).as("simhash"))
    val clusters = sig.groupBy("simhash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = clusters
      .select(col("simhash"), col("ds"), explode(sequence(lit(0), lit(19))).as("band"))
      .withColumn("bh", expr(bhExpr(sparkAt, sparkShr, "band+1")))
    // hamming verify BEFORE the pair-dedup; arrays ride as first() payloads
    // so the dedup groups only on the two signature longs
    val sigPairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.simhash") < col("y.simhash"))
      .withColumn("hamming", expr("bit_count(x.simhash ^ y.simhash)"))
      .filter(col("hamming") <= 3)
      .groupBy(col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .agg(first(col("x.ds")).as("dsa"), first(col("y.ds")).as("dsb"),
        first(col("hamming")).as("hamming"))
    val cross = sigPairs
      .select(explode(col("dsa")).as("a0"), col("dsb"), col("hamming"))
      .select(col("a0"), explode(col("dsb")).as("b0"), col("hamming"))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"), col("hamming"))
    val intra = clusters
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (a, i) -> transform(slice(ds, i + 2, size(ds)), b -> named_struct('a', a, 'b', b))))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), lit(0).cast("int").as("hamming"))
    cross.unionAll(intra).orderBy("a", "b")
  }

  /** Q62 — near-duplicate CLUSTERS: connected components
    * ([[graft.operators.Components]], min-label propagation with pointer
    * jumping) over the verified q21 n-gram-Jaccard pair graph, with the
    * component's minimum doc_id as the canonical cluster id (what a dedup
    * pipeline keys representative selection on — pairs alone under-merge:
    * A~B and B~C must collapse to one cluster even when A~C misses the
    * threshold). The oracle reaches the same fixpoint through a recursive
    * transitive-closure CTE; both engines start from the bit-identical
    * q21 pair set, and min-label is order-independent, so the clustering
    * is exact, not approximate.
    */
  val q62DedupClusters: QueryDef = QueryDef.sql(
    "q62_dedup_clusters",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |e AS (SELECT a AS x, b AS y FROM pairsq UNION SELECT b AS x, a AS y FROM pairsq),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x)
       |SELECT l.doc_id, l.cluster_id, c.n AS cluster_size
       |FROM lbl l JOIN (SELECT cluster_id, count(*) AS n FROM lbl GROUP BY cluster_id) c
       |  ON l.cluster_id = c.cluster_id
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // the materialized CLUSTER layout, not a live recompute: the cluster
    // job runs once at ingest (sources/ClusterAssignment, itself over the
    // stamped PairGraph) and q62 reads its labels — component recomputation
    // was the suite's slowest row (1.4 s at sf0.1) before this
    val cc = graft.sources.ClusterAssignment(s, dir)
      .select(col("doc_id").as("id"), col("cluster_full").as("component"))
    val sizes = cc.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component").as("cluster_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Q63 — the DEDUPLICATED CORPUS: near-dup clusters applied back to the
    * documents table, keeping each cluster's minimum doc_id and every
    * unpaired document ([[graft.operators.Components.canonicalize]]) —
    * the actual deliverable of a dedup pipeline (q20/q21/q31 find, q62
    * clusters, q63 emits what survives).
    *
    * THRESHOLD HYGIENE (measured): q62 deliberately clusters the FULL
    * q21 pair graph (jaccard ≥ 0.06) to expose raw transitive structure —
    * but transitive merging at a weak threshold over-deletes
    * catastrophically: at sf0.01 that graph chains 498 of 500 docs into
    * one component, so "dedup" would keep 2 documents. The corpus is
    * bimodal (7 436 pairs in [0.06, 0.2) vs 25 true near-dups ≥ 0.7), so
    * the DELIVERABLE thresholds edges at jaccard ≥ 0.5 before clustering
    * — the standard practice for exactly this cluster-growth reason.
    *
    * Scale shape: anti-join against the "non-canonical member" set, so
    * the corpus never shuffles on cluster keys — at 100 TB the drop set
    * is |docs-in-strong-pairs| rows broadcast or hash-joined against the
    * corpus scan, and everything upstream is q62's bounded machinery.
    */
  val q63CanonicalCorpus: QueryDef = QueryDef.sql(
    "q63_canonical_corpus",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |drop AS (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM drop)
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    // drop set straight off the stamped cluster labels: a non-canonical
    // member is any doc whose strong label isn't itself — no CC at query
    // time, and the corpus never shuffles on cluster keys (anti-join
    // against the tiny drop set, as before)
    val docs = Tables(s, dir, "documents")
    val drop = graft.sources.ClusterAssignment(s, dir)
      .filter(col("cluster_strong").isNotNull &&
        col("doc_id") =!= col("cluster_strong"))
      .select("doc_id")
    docs.join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Q67 — exact-substring span dedup (the ExactSubstr operator of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    * any 8-token span occurring ≥2 times corpus-wide keeps its FIRST
    * occurrence (min (doc_id, pos)) and every other occurrence's tokens are
    * removed; each document is re-emitted with its surviving tokens in
    * original order.
    *
    * Plan shape at 100 TB: span extraction is explode over a per-row
    * sequence (linear in corpus tokens, map-only); duplicate detection is a
    * groupBy(span) whose map-side combine collapses hot spans per partition
    * before the exchange; the removal join probes occurrences against the
    * DUPLICATED-span table only (unique span keys — a boilerplate span that
    * occurs 10⁹ times is one build row, with AQE skew-split handling the
    * probe side); coverage explode is ≤ 8·|removed occurrences|; reassembly
    * is one groupBy(doc_id) with per-doc-bounded state. No all-pairs stage
    * anywhere. Duplicate discovery and the removal join are keyed on the
    * q17 ROLLING-HASH FINGERPRINT of the span, not the span string — the
    * exchange carries 64-bit keys (~8× less shuffle width than an 8-token
    * string); the span text itself never leaves the map side. Both engines
    * share the identical fold (`FingerprintSql`), so the oracle compare
    * stays bit-exact including on the (rare, mod-1e9+7) hash collisions —
    * a production build would widen to a 128-bit hash to make collisions
    * negligible, which changes no plan shape here.
    *
    * First-occurrence keep key is a struct-min of (doc_id, pos) — exact at
    * any document length; the oracle packs doc_id·2²¹+pos, identical
    * ordering for docs under 2M tokens (the generator's bound).
    */
  /** q67's core, shared with the declarative `span_dedup` curation stage
    * (one implementation, no forks): duplicated k-token spans keep their
    * first occurrence; returns (doc_id, n_tokens, n_dropped, kept_text).
    */
  private[graft] def spanDeduped(docs: org.apache.spark.sql.DataFrame,
      k: Int = 8): org.apache.spark.sql.DataFrame = {
    // explicit-width spread before the k-wide span explode: a small
    // single-file corpus scans as ONE partition and the whole occ/dup
    // chain inherits it (measured 13 tasks across 8 stages at sf0.1);
    // the explode multiplies rows ~|tokens|×, so parallelism must be
    // pinned BEFORE it, and an explicit count is AQE-coalesce-proof.
    // At real corpus scale the scan already has thousands of partitions
    // and this hash exchange on doc_id is noise against the span stage.
    val par = docs.sparkSession.sessionState.conf.numShufflePartitions
    // drop null-text docs so the left-join reassembly tail stays
    // row-identical to the oracle's unnest + GROUP BY, which never emits a
    // row for them (ADVICE r21; generated corpora have no null text, so
    // this is a latent-contract guard, not a result change). The guard is
    // on TEXT, not on split(text): split of a non-null string is never
    // null, the predicates are equivalent — and a w-side filter was
    // measured to re-evaluate the split per row just to null-check it
    // (plans/r22 interim dump), where isnotnull(text) pushes to the scan.
    val t = docs.filter(col("text").isNotNull)
      .repartition(par, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    // occ feeds two consumers (duplicate-discovery build, removal probe) but
    // is deliberately NOT persisted: it is O(corpus tokens × k) wide — the
    // one relation here you must never materialize at 100 TB — and a
    // measured A/B (solo sf0.1, 3 runs) put the persist within this box's
    // noise (2.13 → 1.95 s). The residual vs the oracle is the fixed
    // multi-job floor, not recompute. r22 re-ran the A/B at 10× corpus in
    // ONE JVM (tools/SpanPersistAb, q67PersistOcc knob): see
    // OPTIMIZATION_r22.md §7b for the scale-shaped receipt.
    // Span fingerprints come from the FUSED k-gram kernel (r21): the
    // slice+concat_ws+rolling_hash form materialized the 8-token string
    // and re-hashed ~8 tokens per span; ngram_hashes hashes each token
    // once and composes windows in O(arity) modmuls — bit-identical to
    // RollingHash over the space-joined window (ShingleHashes contract,
    // property-pinned for arity 8 in TextFunctionsSpec), and it runs in
    // BOTH occ evaluations since the subtree is recomputed by design.
    // posexplode's 0-based p maps to the 1-based span start i = p + 1;
    // docs under k tokens emit no windows (kernel contract), exactly the
    // old size(w) >= k guard.
    val occ0 = t
      .select(col("doc_id"), posexplode(org.apache.spark.sql.graft
        .TextExpressions.ngram_hashes(col("w"), k)).as(Seq("p", "fp")))
      .select(col("doc_id"), (col("p") + 1).as("i"), col("fp"))
    // measurement knob ONLY (tools/SpanPersistAb): persist occ to price the
    // recompute-vs-materialize trade at larger corpora in one JVM. Default
    // off — the production answer. Not a bare-scan-canonicalizable frame
    // (repartition → split → posexplode), so the r16 cache-substitution
    // hazard does not apply; Caches.clearAll releases it after each run.
    val occ = if (q67PersistOcc)
      occ0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else occ0
    val dup = occ.groupBy("fp")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("i"))).as("keep"))
      .filter(col("c") >= 2).select("fp", "keep")
    val rm = occ.join(dup, "fp")
      .filter(col("doc_id") =!= col("keep.doc_id") || col("i") =!= col("keep.i"))
      .select("doc_id", "i")
    // Reassembly IN-ROW (r21): the covered positions collapse to one
    // sorted-distinct int array per doc (collect_set bounds at the doc's
    // own token count), broadcast/hash-joined back onto the tokenized
    // corpus, and the surviving text re-joins in a single merge pass
    // (native remove_tokens — an empty drop set reproduces
    // array_join(w, ' ') exactly, so untouched docs round-trip). The
    // previous tail exploded EVERY corpus token, left-joined the cover
    // marks on (doc_id, j), and re-collected + sorted every token into
    // an ObjectHashAggregate buffer — a corpus-token-wide exchange and a
    // per-doc sort whose only purpose was to undo the explode.
    val coverArr = rm
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + lit(k - 1))).as("j"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("j"))).as("drops"))
    t.join(coverArr, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("drops")), lit(0)).cast("long").as("n_dropped"),
        org.apache.spark.sql.graft.TextExpressions.remove_tokens(col("w"),
          coalesce(col("drops"), expr("CAST(array() AS ARRAY<INT>)")))
          .as("kept_text"))
  }

  val q67SpanDedup: QueryDef = QueryDef.sql(
    "q67_span_dedup",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |occ AS (
      |  SELECT doc_id, i,
      |    ${FingerprintSql("list_aggregate(w[i:i+7], 'string_agg', ' ')")} AS fp
      |  FROM t, unnest(range(1, len(w) - 6)) AS u(i)),
      |dup AS (
      |  SELECT fp, min(doc_id * 2097152 + i) AS keep
      |  FROM occ GROUP BY fp HAVING count(*) >= 2),
      |rm AS (
      |  SELECT o.doc_id, o.i FROM occ o JOIN dup d ON o.fp = d.fp
      |  WHERE o.doc_id * 2097152 + o.i <> d.keep),
      |cover AS (SELECT DISTINCT doc_id, i + k AS j FROM rm, unnest(range(0, 8)) AS u(k)),
      |tok AS (
      |  SELECT doc_id, unnest(w) AS tok, unnest(range(1, len(w) + 1)) AS j FROM t),
      |f AS (
      |  SELECT tk.doc_id, tk.j, tk.tok, c.j IS NOT NULL AS dropped
      |  FROM tok tk LEFT JOIN cover c ON tk.doc_id = c.doc_id AND tk.j = c.j)
      |SELECT doc_id, count(*) AS n_tokens,
      |  count(*) FILTER (dropped) AS n_dropped,
      |  coalesce(string_agg(tok, ' ' ORDER BY j) FILTER (NOT dropped), '') AS kept_text
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    spanDeduped(Tables(s, dir, "documents"), k = 8).orderBy("doc_id")
  }

  /** Q68 — leakage-safe train/val/test split: the split is assigned per
    * NEAR-DUP CLUSTER, not per document, so two near-duplicates can never
    * straddle train and test (decontamination by construction — the split
    * discipline of the FineWeb/Dolma pipelines). Cluster ids come from the
    * same strong-edge (jaccard ≥ 0.5) components as q63; unpaired docs are
    * their own singleton cluster. The 80/10/10 gate is the engine's
    * deterministic rolling-hash fingerprint of the salted cluster id —
    * identical on re-runs, identical cross-engine, and independent of the
    * q49/q57 sampling gates (different salt).
    *
    * Scale shape: the pair graph and components are the q62/q63 machinery
    * (capped posting lists, pointer-jumped CC); the split itself is one
    * broadcast/hash LEFT join of docs against the clustered-doc relation
    * (|docs-in-strong-pairs| rows, tiny vs corpus) plus a map-only hash
    * gate — the corpus never shuffles on cluster keys.
    */
  val q68LeakageSafeSplit: QueryDef = QueryDef.sql(
    "q68_leakage_safe_split",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |cl AS (
       |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster_id,
       |  ${FingerprintSql("'s' || CAST(cluster_id AS VARCHAR)")} % 100 AS h
       |  FROM cl)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.sources.SplitAssignment(s, dir)
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")
  }

  /** The q68 split computed INLINE from the corpus — the build function
    * behind [[graft.sources.SplitAssignment]]'s persisted layout, and the
    * equality reference SplitAssignmentSpec pins the layout against. Every
    * query-path consumer (q68/q70/q81) reads the layout instead; only the
    * layout build and the spec call this directly.
    */
  private[graft] def leakageSafeSplitFrame(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = Tables(s, dir, "documents")
    // strong cluster labels from the stamped layout — the split build is
    // the fourth consumer of the ingest-time cluster job (with q62/q63/
    // q101), so a cold ingest runs CC exactly twice (full + strong slices)
    val cc = graft.sources.ClusterAssignment.strongComponents(s, dir)
      .select(col("id").as("doc_id"), col("component"))
    val h = graft.functions.TextFunctions
      .fingerprint("concat('s', CAST(cluster_id AS STRING))") % 100
    docs.select("doc_id").join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .select("doc_id", "cluster_id", "split")
  }

  /** q74's near-duplicate dot threshold. The embeddings are unit-normalized
    * (‖x‖² = 1 ± 2e-7 — see VectorOps q60), so the dot IS the cosine; 0.25
    * is the same operating point q46's banded LSH verifies at on this
    * corpus. Production SemDeDup runs τ ≈ 0.95+ on real encoder output —
    * one constant, same plan.
    */
  private val SemTau = 0.25

  /** Q74 — semantic deduplication (SemDeDup, Abbas et al. 2023): cluster
    * the embedding space with the ANN coarse quantizer (the persisted
    * IvfCentroids codebook — trained once per corpus, shared with
    * q42/q53/q58/q64), then look for near-duplicate pairs ONLY inside each
    * cluster and drop the pair member more similar to its centroid,
    * keeping the lower-centroid-similarity example per the paper's rule.
    * The embedding-space complement to q63's token-space canonicalization:
    * it removes paraphrase/template redundancy n-grams cannot see.
    *
    * Scale shape: the pair search is confined to cells — with k ∝ N/cell
    * (the IVF sizing rule this corpus's codebook follows), per-cell work
    * is bounded and the self-join shuffles on the cell key instead of
    * exploding quadratically; the assignment itself is the map-only argmin
    * over the broadcast codebook every IVF query already pays. Exact-dup
    * storms inside one cell surface as AQE-splittable skew, and the
    * verify dot runs only on same-cell pairs (the q21/q46 candidate
    * discipline).
    *
    * Determinism: centroids are the decimal-exact persisted tables (q42's
    * proof), every dot is the same sequential double fold in both engines,
    * and the drop rule's (cdot, id) comparisons are over identical doubles
    * — so the kept set is bit-stable with no quantization needed.
    */
  /** q74's assignment frame: each embedding with its coarse cell and its
    * dot to the cell centroid. Shared with the declarative `semantic_dedup`
    * curation stage (one implementation, no forks). `emb` must carry
    * (vec_id, label, embedding); `c1` is a trained centroid table.
    */
  private[graft] def semdedupFrame(emb: org.apache.spark.sql.DataFrame,
      c1: Seq[(Long, Seq[Double])]): org.apache.spark.sql.DataFrame = {
    val cents = emb.sparkSession.createDataFrame(c1).toDF("c_label", "centroid")
    graft.ml.KMeans.assignWith(emb, c1)
      .join(broadcast(cents), col("cell") === col("c_label"))
      .select(col("vec_id"), col("label"), col("cell").cast("long").as("cell"),
        col("embedding"),
        graft.functions.VectorFunctions.dot(col("embedding"), col("centroid")).as("cdot"))
  }

  /** The SemDeDup drop set over a [[semdedupFrame]]: for every same-cell
    * pair over `tau`, the member MORE similar to its centroid drops (ties
    * drop the larger id). Returns one `vec_id` column.
    *
    * Exact-dup storms (q39's cluster-before-band discipline): identical
    * embeddings COLLAPSE to one representative before the pair stage, so
    * a vector duplicated 10⁶ times contributes one row to the quadratic
    * join instead of 10¹² pairs. This is semantics-preserving, which the
    * unchanged pairwise oracle proves on every run: within an identical
    * group all cdots are equal, so the pairwise rule keeps exactly the
    * min id (when the group's self-dot clears `tau` — the gate below) and
    * any cross-group pair drops either ALL of one group (cdot differs /
    * rep-id tie) — the rep-level decision expanded back to members.
    * SkewSpec drives the 2000-identical-vector storm and asserts the pair
    * join's own metrics stayed collapsed. Grouping keys carry the
    * embedding itself at test scale; a 100 TB deployment pre-hashes the
    * vector bytes to a 128-bit content key (collision-negligible) so the
    * exchange stays narrow.
    */
  private[graft] def semdedupDrops(w: org.apache.spark.sql.DataFrame,
      tau: Double): org.apache.spark.sql.DataFrame = {
    val selfDot = org.apache.spark.sql.graft.VectorExpressions
      .float_dot(col("embedding"), col("embedding"))
    // r21 MEASURED NEGATIVE: replacing this groupBy + rejoin with a
    // min-over-(cell, embedding) window (one reusable exchange, 19 → 14
    // jobs) ran 2.5× SLOWER isolated (1.29 → 3.31 s min) — WindowExec
    // sorts every partition by the float-ARRAY key with per-comparison
    // array walks and does no partial aggregation, where the hash
    // aggregate collapses identical vectors map-side. The rejoin shape
    // stands.
    val grp = w.groupBy(col("cell"), col("embedding"))
      .agg(min(col("vec_id")).as("rep"), min(col("cdot")).as("cdot"))
    val x = grp.select(col("rep").as("id_a"), col("cell"),
      col("embedding").as("ea"), col("cdot").as("ca"))
    val y = grp.select(col("rep").as("id_b"), col("cell").as("cell_b"),
      col("embedding").as("eb"), col("cdot").as("cb"))
    val repDrops = x
      .join(y, col("cell") === col("cell_b") && col("id_a") < col("id_b"))
      .filter(org.apache.spark.sql.graft.VectorExpressions
        .float_dot(col("ea"), col("eb")) > tau)
      .select(when(col("ca") > col("cb"), col("id_a")).otherwise(col("id_b")).as("rep"))
      .distinct()
    val wr = w.join(grp.select(col("cell"), col("embedding"), col("rep")),
      Seq("cell", "embedding"))
    // (a) non-representative members of an identical group whose self-dot
    // clears tau (the pairwise rule keeps only the min id); (b) every
    // member of a group whose representative lost a cross-group pair
    val selfDup = wr
      .filter(col("vec_id") =!= col("rep") && selfDot > tau)
      .select("vec_id")
    val crossDrops = wr.join(repDrops, "rep").select("vec_id")
    selfDup.union(crossDrops).distinct()
  }

  val q74Semdedup: QueryDef = QueryDef.sql(
    "q74_semdedup",
    s"""WITH ${VectorOps.IvfAssignScaledCtes},
       |w AS (
       |  SELECT e.vec_id, e.label, e.cell, e.embedding,
       |    ${graft.functions.VectorFunctions.DotSeqSql("e.embedding", "c.centroid")} AS cdot
       |  FROM a1s e JOIN c1s c ON e.cell = c.c_label),
       |p AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cdot AS ca, y.cdot AS cb,
       |    ${graft.functions.VectorFunctions.DotSeqSql("x.embedding", "y.embedding")} AS dot
       |  FROM w x JOIN w y ON x.cell = y.cell AND x.vec_id < y.vec_id),
       |drops AS (
       |  SELECT DISTINCT CASE WHEN ca > cb THEN id_a ELSE id_b END AS vec_id
       |  FROM p WHERE dot > $SemTau)
       |SELECT w.vec_id, w.label, CAST(w.cell AS BIGINT) AS cell, w.cdot,
       |  (d.vec_id IS NULL) AS kept
       |FROM w LEFT JOIN drops d ON w.vec_id = d.vec_id
       |ORDER BY w.vec_id""".stripMargin) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings")
    // the scale-sized codebook (k = scaleK(N), ~CellTarget vectors/cell)
    // bounds within-cell pair work — NOT the label codebook, whose fixed
    // k makes the confined pair stage Θ(N²/k)
    val (_, c1s) = graft.sources.IvfCentroids.scaled(s, dir)
    val w = semdedupFrame(emb, c1s)
    val drops = semdedupDrops(w, SemTau)
    w.select("vec_id", "label", "cell", "cdot")
      .join(drops.withColumn("__dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("cell"), col("cdot"),
        col("__dropped").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** Q98 — cross-source duplication matrix: for every unordered pair of
    * sources, how many strong near-dup pairs (q21 relation at q63's
    * jaccard ≥ 0.5 canonicalization threshold — ONE definition of
    * "near-dup" across the suite) span them. This is the audit that
    * drives SOURCE-level curation decisions — which feeds mirror each
    * other (off-diagonal mass says drop/downweight one), which scrape
    * themselves (diagonal mass says dedup within the feed before
    * mixing) — the corpus-provenance readout a multi-feed pretraining
    * recipe starts from.
    *
    * Plan shape at 100 TB: a CONSUMER of the materialized
    * [[graft.sources.PairGraph]] layout (like q62/q63) — the pair
    * relation is DfCap-bounded and orders of magnitude smaller than the
    * corpus, so the two provenance joins put a tiny build side against
    * the (doc_id, source) projection of the scan, and the final group is
    * |sources|²-bounded with map-side partials. No shingling, no
    * banding, no pair generation at query time. The oracle recomputes
    * the whole pair relation from scratch (q63's discipline).
    */
  val q98SourceDupMatrix: QueryDef = QueryDef.sql(
    "q98_source_dup_matrix",
    s"""WITH pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5)
       |SELECT least(da.source, db.source) AS src_lo,
       |  greatest(da.source, db.source) AS src_hi,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM strong s
       |JOIN documents da ON da.doc_id = s.a
       |JOIN documents db ON db.doc_id = s.b
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val src = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    graft.sources.PairGraph(s, dir)
      .filter(col("jaccard") >= graft.sources.ClusterAssignment.StrongJaccard)
      .select("a", "b")
      .join(src.select(col("doc_id").as("a"), col("source").as("sa")), "a")
      .join(src.select(col("doc_id").as("b"), col("source").as("sb")), "b")
      .select(least(col("sa"), col("sb")).as("src_lo"),
        greatest(col("sa"), col("sb")).as("src_hi"))
      .groupBy("src_lo", "src_hi").agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_lo", "src_hi")
  }

  /** Q100 — MinHash calibration meter: what does a signature agreement
    * level actually IMPLY about true Jaccard on this corpus? For every
    * q31 candidate pair, count the agreeing positions of the two 16-slot
    * signatures (the unbiased Jaccard estimator: E[matches/16] = J) and
    * bucket pairs by that count; per bucket, report the pair count and
    * the EXACT-Jaccard sum (per-pair nano-quantized by integer division
    * — `inter·10⁹ div union` — so the sum is an exact long and the
    * compare is bit-trivial; the reader's one division yields the
    * bucket's mean true Jaccard against its predicted matches/16).
    *
    * This is the q53/q89 honest-measurement discipline applied to the
    * dedup index itself: band thresholds are chosen from the theoretical
    * S-curve, and this meter is the empirical curve on YOUR corpus — if
    * bucket m's mean J drifts from m/16, the shingle distribution is
    * violating the uniformity the theory assumes (e.g. hot shingles
    * compressing the hash range) and the banding depth needs re-deriving.
    *
    * Plan shape: q31's candidate machinery (banded, never all-pairs)
    * plus one ≤17-row map-side-combined group — the meter costs one
    * signature zip per CANDIDATE, not per pair of documents.
    *
    * SAMPLING (r19): like q107, the meter keeps every banded candidate
    * with no verify gate, so its candidate volume carries whatever the
    * corpus's true-similarity mass is — docs gate on
    * `fingerprint(doc_id) % [[calibSigMod]](N) = 0` (q89's membership
    * rule — the rolling hash scatters any id distribution), 1 at every
    * test SF, thinning candidates ~1/mod² beyond. Mirrored in the
    * oracle's `smod` CTE; per-bucket means unbiased.
    */
  val q100MinhashCalibration: QueryDef = QueryDef.sql(
    "q100_minhash_calibration",
    s"""WITH smod AS (
       |  SELECT greatest(1, (count(*) + ${CalibSigTarget - 1}) // $CalibSigTarget) AS m
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, ${FingerprintSql("s")} AS fp
       |  FROM (SELECT doc_id, $WordBigramsOverT AS bg
       |        FROM (SELECT doc_id, $ToksSql AS t FROM documents)) x, unnest(x.bg) AS u(s)),
       |fps0 AS (SELECT doc_id, list(fp ORDER BY fp) AS fps FROM sh GROUP BY doc_id),
       |fps AS (SELECT fps0.* FROM fps0, smod
       |        WHERE ${FingerprintSql("CAST(doc_id AS VARCHAR)")} % smod.m = 0),
       |sig AS (
       |  SELECT doc_id,
       |    [list_min([($ADuck[j] * fp + $BDuck[j]) % $P for fp in fps])
       |     for j in range(1, 17)] AS sig
       |  FROM fps WHERE len(fps) > 0),
       |bands AS (
       |  SELECT doc_id, j AS band,
       |    list_reduce(sig[4*j+1 : 4*j+4], (a, b) -> (a * 31 + b) % $P) AS bh
       |  FROM sig, unnest([0, 1, 2, 3]) AS t(j)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id < y.doc_id),
       |m AS (
       |  SELECT
       |    len([1 for j in range(1, 17) IF sa.sig[j] = sb.sig[j]]) AS est_matches,
       |    (CAST(len(list_intersect(fa.fps, fb.fps)) AS BIGINT) * 1000000000)
       |      // (len(fa.fps) + len(fb.fps) - len(list_intersect(fa.fps, fb.fps)))
       |      AS j_n9
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.a
       |  JOIN sig sb ON sb.doc_id = c.b
       |  JOIN fps fa ON fa.doc_id = c.a
       |  JOIN fps fb ON fb.doc_id = c.b)
       |SELECT CAST(est_matches AS BIGINT) AS est_matches,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(j_n9) AS BIGINT) AS sum_j_n9
       |FROM m
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    // fingerprint sets come from the ingest-stamped DocFingerprints
    // layout (r18): the shingle pass ran once at ingest; this query reads
    // the (doc_id, fps) column store — twice (sig derivation + the
    // per-candidate intersects), but a parquet re-scan of the layout is
    // NOT persisted: the layout read is a bare-scan-shaped plan, and
    // persisting one poisons every later plan over the table via cache
    // substitution (the r16 lesson). Empty-fingerprint docs are absent
    // from the layout by construction (its q100-rule filter), so for any
    // surviving pair szsum − inter ≥ max(|a|,|b|) ≥ 1 — the union
    // denominator below cannot be zero.
    val mcal = calibSigMod(
      graft.sources.CorpusStats.rowCount(s, dir, "documents"))
    val fps = graft.sources.DocFingerprints(s, dir)
      .filter(graft.functions.TextFunctions
        .fingerprint("cast(doc_id as string)") % mcal === 0)
    val sig = fps.select(col("doc_id"),
      org.apache.spark.sql.graft.SketchExpressions
        .minhash_signature(col("fps"), hashA, hashB, P).as("sig"))
    val bands = sig
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("doc_id"), col("band"),
        expr(s"aggregate(slice(sig, 4*band+1, 4), 0L, (a, b) -> (a * 31 + b) % $P)").as("bh"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("a"), col("sig").as("siga")), "a")
      .join(sig.select(col("doc_id").as("b"), col("sig").as("sigb")), "b")
      .join(fps.select(col("doc_id").as("a"), col("fps").as("fpsa")), "a")
      .join(fps.select(col("doc_id").as("b"), col("fps").as("fpsb")), "b")
      // intersect ONCE per candidate via the allocation-free sorted
      // merge (layout rows are sorted distinct — sorted_intersect_count's
      // contract), then derive the quantized ratio from the scalar
      .select(
        expr("size(filter(zip_with(siga, sigb, (x, y) -> x = y), v -> v))")
          .cast("long").as("est_matches"),
        org.apache.spark.sql.graft.SketchExpressions
          .sorted_intersect_count(col("fpsa"), col("fpsb"))
          .cast("long").as("inter"),
        (size(col("fpsa")) + size(col("fpsb"))).cast("long").as("szsum"))
      .select(col("est_matches"),
        expr("inter * 1000000000L div (szsum - inter)").as("j_n9"))
      .groupBy("est_matches")
      .agg(count(lit(1)).as("n_pairs"), sum(col("j_n9")).as("sum_j_n9"))
      .orderBy("est_matches")
  }

  /** Q101 — dedup ROI: the cluster-size histogram of q63's strong
    * components with the DOCUMENT and TOKEN savings canonicalization
    * buys at each size. Per cluster size: how many clusters, how many
    * docs the keep-minimum rule drops, and how many tokens those dropped
    * docs carried — the number a curation owner weighs against dedup's
    * compute cost, and the tail read (a handful of giant clusters vs
    * many pairs) that decides whether boilerplate removal or true dedup
    * is the dominant effect. Exact integers end to end.
    *
    * Plan shape: a scan of the stamped [[graft.sources.ClusterAssignment]]
    * strong labels (docs-in-strong-pairs rows, orders smaller than the
    * corpus — the cluster job ran once at ingest), one provenance join
    * onto the corpus's (doc_id, n_tok) projection, then two small groups
    * (|clusters|, then |distinct sizes|) — both map-side combined.
    */
  val q101DedupSavings: QueryDef = QueryDef.sql(
    "q101_dedup_savings",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |tok AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tok FROM documents),
       |cl AS (
       |  SELECT l.cluster_id, count(*) AS sz,
       |    sum(CASE WHEN l.doc_id = l.cluster_id THEN 0 ELSE t.n_tok END) AS tokd
       |  FROM lbl l JOIN tok t ON t.doc_id = l.doc_id
       |  GROUP BY 1)
       |SELECT CAST(sz AS BIGINT) AS cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(sz - 1) AS BIGINT) AS n_docs_dropped,
       |  CAST(sum(tokd) AS BIGINT) AS tok_dropped
       |FROM cl
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    val cc = graft.sources.ClusterAssignment.strongComponents(s, dir)
    val tok = Tables(s, dir, "documents")
      .select(col("doc_id"), size(tokens("text")).cast("long").as("n_tok"))
    cc.join(tok, cc("id") === tok("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("sz"),
        sum(when(col("id") === col("component"), 0L)
          .otherwise(col("n_tok"))).as("tokd"))
      .groupBy(col("sz").cast("long").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz") - 1).cast("long").as("n_docs_dropped"),
        sum(col("tokd")).cast("long").as("tok_dropped"))
      .orderBy("cluster_size")
  }

  /** Q104 — cluster source-purity audit: the strong near-dup clusters
    * bucketed by (size, distinct sources spanned). q98 counts cross-feed
    * duplication at the PAIR level; this is the CLUSTER-level readout —
    * a cluster confined to one source is intra-feed boilerplate (dedup
    * within the feed, cheap), a cluster spanning feeds means mirrored
    * content (pick a feed, or the canonical rule silently prefers
    * whichever feed minted the smaller doc_id — a provenance-bias
    * question this audit is how you notice). Per bucket: cluster count,
    * total docs, and docs the keep-minimum rule drops.
    *
    * Plan shape: the third consumer of the stamped
    * [[graft.sources.ClusterAssignment]] layout (with q62/q63/q101) —
    * strong labels scanned, one provenance join onto (doc_id, source),
    * a |clusters|-sized group (map-side combined; the n_sources
    * count-distinct expands to |cluster|·|sources| keys at worst), then
    * a ≤|sizes|·|sources| bucket group. The corpus contributes only its
    * two-column projection; the oracle recomputes components from
    * scratch (q101's discipline).
    */
  val q104ClusterPurity: QueryDef = QueryDef.sql(
    "q104_cluster_purity",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |cl AS (
       |  SELECT l.cluster_id, count(*) AS sz,
       |    count(DISTINCT d.source) AS n_src
       |  FROM lbl l JOIN documents d ON d.doc_id = l.doc_id
       |  GROUP BY 1)
       |SELECT CAST(sz AS BIGINT) AS cluster_size,
       |  CAST(n_src AS BIGINT) AS n_sources,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(sz) AS BIGINT) AS n_docs,
       |  CAST(sum(sz - 1) AS BIGINT) AS n_docs_dropped
       |FROM cl
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val cc = graft.sources.ClusterAssignment.strongComponents(s, dir)
    val src = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    cc.join(src, cc("id") === src("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("source")).as("n_src"))
      .groupBy(col("sz").cast("long").as("cluster_size"),
        col("n_src").cast("long").as("n_sources"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).cast("long").as("n_docs"),
        sum(col("sz") - 1).cast("long").as("n_docs_dropped"))
      .orderBy("cluster_size", "n_sources")
  }

  /** Q107 — SimHash calibration meter: q100's honest-measurement
    * discipline pointed at the OTHER dedup index. Every q39 banded
    * candidate signature pair — WITHOUT the hamming ≤ 3 verify, the
    * meter wants the whole curve — expands to doc pairs bucketed by full
    * 32-bit hamming distance, with the per-bucket exact word-bigram
    * Jaccard sum (q100's nano-quantized integer j_n9, same reference
    * similarity for both calibration meters so the two indexes are
    * comparable on one scale). The reading: does hamming ≤ 3 actually
    * correspond to the similarity level the verify threshold assumes on
    * THIS corpus, and how fast does true similarity decay per extra
    * flipped bit — the empirical curve that justifies (or re-tunes) the
    * radius, next to q100's matches/16 curve for the MinHash side.
    *
    * Plan shape: q39's production layout — signature clustering BEFORE
    * banding (exact-dup storms never enter the join), 20-table banding
    * keys the shuffle, candidates are distinct-signature pairs expanded
    * to doc pairs only after the (here absent) verify — plus q100's
    * per-candidate fingerprint-set intersect and one ≤33-row map-side
    * group. Empty-fingerprint docs can band (their simhash is over
    * unigram hashes) but carry no bigram set; both engines drop them at
    * the fps join (Spark: the explicit size > 0 guard; DuckDB: unnest
    * never produces them), q100's degenerate-input rule.
    *
    * SAMPLING (r19, the scale canary's one super-linear catch): unlike
    * the verify-gated q39, this meter keeps EVERY banded candidate, and
    * SimHash banding gives no geometric candidate bound — on a
    * self-similar corpus the candidate volume is Θ(N²) (measured 63×
    * wall at 10× corpus, output flat — tools/ScaleCanary). A meter earns
    * its keep by SAMPLING (q89's rule): signatures gate on
    * `simhash % [[calibSigMod]](N) = 0` — [[calibSigMod]] is 1 at every
    * test SF (results bit-identical, the q89 floor discipline) and grows
    * with N so sampled candidates stay ~bounded (cross-signature pairs
    * thin by 1/mod², the dominant term). Signature-uniform membership,
    * mirrored verbatim in the oracle's `smod` CTE; per-bucket jaccard
    * means stay unbiased (inclusion is independent of the pair's
    * similarity). The hamming-0 bucket samples at 1/mod (one signature
    * decides), the rest at 1/mod² — cross-bucket n_pairs comparisons at
    * mod > 1 read per-bucket, as any sampled meter's do.
    *
    * PLATEAU, not trend: mod = ceil(N / CalibSigTarget) keeps the
    * sampled signature population ≈ CalibSigTarget (~5,000 docs) at ANY
    * corpus size, so the candidate volume is bounded by that fixed-size
    * sample's own collision curve — the per-candidate exact-Jaccard
    * intersects this meter pays are a CONSTANT cost from the first
    * mod > 1 corpus onward, independent of N. Measured at 10× sf0.1
    * (tools/ScaleCanary, judge-re-run r19): warm wall 1.98 s → 10.87 s
    * (5.5×, vs 63× unsampled), candidate rows 5.16 M → 12.9 M (2.5×);
    * the 10× point is where mod first exceeds 1, so those numbers ARE
    * the plateau — a 100× corpus re-pays the same sampled collision
    * curve, plus only the linear signature scan.
    */
  /** The calibration meters' signature-sample target: [[calibSigMod]]
    * stays 1 for any corpus up to this many docs (every test SF —
    * results unchanged) and thereafter thins candidates ~quadratically
    * (the q89 floor discipline applied to the pair-generating side).
    */
  private[graft] val CalibSigTarget = 5000L
  private[graft] def calibSigMod(n: Long): Long =
    math.max(1L, (n + CalibSigTarget - 1) / CalibSigTarget)

  // ---- q107's pipeline stages, factored for tools/Q107Profile ----------
  // One implementation: the query fn composes exactly these (r22 refactor,
  // plan byte-identical — the stages were previously inline vals).

  /** Stage 1: per-doc 32-bit simhash signatures, sampled by calibSigMod. */
  private[graft] def q107Sig(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.SketchExpressions.{simhash32, token_hashes}
    // N is the ingest-time CorpusStats fact (q108's rule); the modulus is
    // 1 at test SFs — the filter is then pass-through, same plan shape
    val mcal = calibSigMod(
      graft.sources.CorpusStats.rowCount(s, dir, "documents"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), simhash32(token_hashes(tokens("text"))).as("simhash"))
      .filter(pmod(col("simhash"), lit(mcal)) === 0)
  }

  /** Stage 2: exact-signature clustering (persisted — feeds both the
    * banding join and the intra-cluster expansion within one execution).
    */
  private[graft] def q107Clusters(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    q107Sig(s, dir).groupBy("simhash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Stage 3: 20-band self-join to DISTINCT candidate signature pairs. */
  private def q107SigPairsFrom(clusters: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bands = clusters
      .select(col("simhash"), col("ds"), explode(sequence(lit(0), lit(19))).as("band"))
      .withColumn("bh", expr(bhExpr(sparkAt, sparkShr, "band+1")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.simhash") < col("y.simhash"))
      .withColumn("hamming", expr("bit_count(x.simhash ^ y.simhash)"))
      .groupBy(col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .agg(first(col("x.ds")).as("dsa"), first(col("y.ds")).as("dsb"),
        first(col("hamming")).as("hamming"))
  }

  private[graft] def q107SigPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    q107SigPairsFrom(q107Clusters(s, dir))

  /** Stage 4: signature pairs expanded to (a, b, hamming) doc pairs —
    * cross-signature candidates plus intra-cluster (hamming 0) pairs.
    */
  private[graft] def q107DocPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val clusters = q107Clusters(s, dir)
    val sigPairs = q107SigPairsFrom(clusters)
    val cross = sigPairs
      .select(explode(col("dsa")).as("a0"), col("dsb"), col("hamming"))
      .select(col("a0"), explode(col("dsb")).as("b0"), col("hamming"))
      .select(least(col("a0"), col("b0")).as("a"),
        greatest(col("a0"), col("b0")).as("b"), col("hamming"))
    val intra = clusters
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (a, i) -> transform(slice(ds, i + 2, size(ds)), b -> named_struct('a', a, 'b', b))))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), lit(0).cast("int").as("hamming"))
    cross.unionAll(intra)
  }

  val q107SimhashCalibration: QueryDef = QueryDef.sql(
    "q107_simhash_calibration",
    s"""WITH smod AS (
       |  SELECT greatest(1, (count(*) + ${CalibSigTarget - 1}) // $CalibSigTarget) AS m
       |  FROM documents),
       |sig0 AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0::BIGINT,
       |      [CASE WHEN list_sum([((th >> j) & 1)*2 - 1 for th in ths]) > 0
       |            THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, 32)]),
       |      (a, b) -> a + b) AS simhash
       |  FROM (SELECT doc_id, [${FingerprintSql("t0")} for t0 in $ToksSql] AS ths
       |        FROM documents)),
       |sig AS (SELECT sig0.* FROM sig0, smod WHERE sig0.simhash % smod.m = 0),
       |bands AS (
       |  SELECT doc_id, simhash, cid AS band, ${bhExpr(duckAt, duckShr, "cid+1")} AS bh
       |  FROM sig, unnest(range(0, 20)) AS t(cid)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |    bit_count(xor(x.simhash, y.simhash)) AS hamming
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |sh AS (
       |  SELECT DISTINCT doc_id, ${FingerprintSql("s")} AS fp
       |  FROM (SELECT doc_id, $WordBigramsOverT AS bg
       |        FROM (SELECT doc_id, $ToksSql AS t FROM documents)) x, unnest(x.bg) AS u(s)),
       |fps AS (SELECT doc_id, list(fp ORDER BY fp) AS fps FROM sh GROUP BY doc_id),
       |m AS (
       |  SELECT c.hamming,
       |    (CAST(len(list_intersect(fa.fps, fb.fps)) AS BIGINT) * 1000000000)
       |      // (len(fa.fps) + len(fb.fps) - len(list_intersect(fa.fps, fb.fps)))
       |      AS j_n9
       |  FROM cand c
       |  JOIN fps fa ON fa.doc_id = c.a
       |  JOIN fps fb ON fb.doc_id = c.b)
       |SELECT CAST(hamming AS BIGINT) AS hamming,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(j_n9) AS BIGINT) AS sum_j_n9
       |FROM m
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    // q100's rule, served by the same ingest-stamped layout: docs that
    // banded on their unigram simhash but carry no bigram set are simply
    // absent here, so the fps joins drop them — and the layout scan is
    // deliberately NOT persisted (bare-scan-shaped plan; r16 cache-
    // substitution lesson)
    val fps = graft.sources.DocFingerprints(s, dir)
    q107DocPairs(s, dir)
      .join(fps.select(col("doc_id").as("a"), col("fps").as("fpsa")), "a")
      .join(fps.select(col("doc_id").as("b"), col("fps").as("fpsb")), "b")
      .select(col("hamming"),
        // allocation-free sorted-merge intersect (layout rows are sorted
        // distinct — sorted_intersect_count's contract): this runs once
        // per banded candidate, the query's dominant per-row cost
        org.apache.spark.sql.graft.SketchExpressions
          .sorted_intersect_count(col("fpsa"), col("fpsb"))
          .cast("long").as("inter"),
        (size(col("fpsa")) + size(col("fpsb"))).cast("long").as("szsum"))
      .select(col("hamming"),
        expr("inter * 1000000000L div (szsum - inter)").as("j_n9"))
      .groupBy(col("hamming").cast("long").as("hamming"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("j_n9")).as("sum_j_n9"))
      .orderBy("hamming")
  }

  /** Q109 — cluster edge-density audit: per strong-cluster size, how
    * many direct pair-graph edges the clusters actually contain vs the
    * sz·(sz−1)/2 a clique would — the CHAIN-vs-CLIQUE readout behind
    * q63's threshold-hygiene warning, quantified. Transitive merging is
    * only safe when clusters are clique-like (every member really
    * resembles every other); a low-density bucket means the threshold is
    * chaining A~B~C merges whose ends never met — exactly the failure
    * mode that collapsed 498 of 500 docs at jaccard ≥ 0.06 — so this is
    * the number you check BEFORE trusting keep-one-per-cluster at a new
    * threshold or on a new corpus. Exact integers: edge counts, possible
    * pairs, and the nano-quantized density ratio.
    *
    * Plan shape: the fourth ClusterAssignment consumer — strong labels
    * scanned twice (once per pair endpoint, tiny relation), the strong
    * PairGraph slice mapped to clusters by two joins (every strong
    * edge's endpoints share a label by construction), a |clusters|-row
    * group, then a ≤|sizes| bucket group. No CC, no shingling, nothing
    * corpus-scale. The oracle recomputes components from scratch (q101's
    * discipline).
    */
  val q109ClusterDensity: QueryDef = QueryDef.sql(
    "q109_cluster_density",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |edges AS (
       |  SELECT la.cluster_id, count(*) AS n_edges
       |  FROM strong s
       |  JOIN lbl la ON la.doc_id = s.a
       |  GROUP BY 1),
       |cl AS (
       |  SELECT l.cluster_id, count(*) AS sz, min(ed.n_edges) AS n_edges
       |  FROM lbl l JOIN edges ed ON ed.cluster_id = l.cluster_id
       |  GROUP BY 1)
       |SELECT CAST(sz AS BIGINT) AS cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(n_edges) AS BIGINT) AS n_edges,
       |  CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_possible,
       |  CAST(sum(n_edges) * 1000000000 // sum(sz * (sz - 1) // 2) AS BIGINT)
       |    AS density_n9
       |FROM cl
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    val cc = graft.sources.ClusterAssignment.strongComponents(s, dir)
    val strong = graft.sources.PairGraph(s, dir)
      .filter(col("jaccard") >= graft.sources.ClusterAssignment.StrongJaccard)
      .select("a", "b")
    // both endpoints of a strong edge share a label by construction, so
    // ONE endpoint join suffices to place the edge in its cluster
    val edges = strong
      .join(cc.select(col("id").as("a"), col("component")), "a")
      .groupBy("component").agg(count(lit(1)).as("n_edges"))
    val cl = cc.groupBy("component").agg(count(lit(1)).as("sz"))
      .join(edges, "component")
    cl
      .groupBy(col("sz").cast("long").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("n_edges")).cast("long").as("n_edges"),
        sum(expr("sz * (sz - 1) div 2")).cast("long").as("n_possible"))
      .select(col("cluster_size"), col("n_clusters"), col("n_edges"),
        col("n_possible"),
        expr("n_edges * 1000000000L div n_possible").as("density_n9"))
      .orderBy("cluster_size")
  }

  /** Q111 — per-source dedup savings: what canonicalization costs each
    * FEED. q101 says what dedup saves by cluster size; this says WHO
    * pays — per source: its document and token totals, the documents
    * and tokens the keep-minimum rule drops, and the nano-quantized
    * dropped-token share. A feed with a high drop share is internally
    * redundant (dedup it before mixing, or down-weight it — the same
    * decision q98's matrix informs at the pair level, here priced in
    * tokens, the unit budgets are written in). Sources with zero drops
    * appear with zeros — absence of redundancy is also a finding.
    *
    * Plan shape: the fifth ClusterAssignment consumer — the drop set is
    * doc_id ≠ cluster_strong off the layout scan (tiny), LEFT-joined
    * onto the corpus's (doc_id, source, n_tok) projection, ONE
    * |sources|-row map-side-combined group over the corpus scan. No CC,
    * no pair work, one linear pass.
    */
  val q111SourceDedupCost: QueryDef = QueryDef.sql(
    "q111_source_dedup_cost",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |drops AS (SELECT doc_id FROM lbl WHERE doc_id <> cluster_id),
       |d AS (
       |  SELECT doc_id, source, CAST(len($ToksSql) AS BIGINT) AS n_tok,
       |    CASE WHEN doc_id IN (SELECT doc_id FROM drops) THEN 1 ELSE 0 END AS dr
       |  FROM documents)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(dr) AS BIGINT) AS n_dropped,
       |  CAST(sum(n_tok) AS BIGINT) AS tok_total,
       |  CAST(sum(CASE WHEN dr = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS tok_dropped,
       |  CAST(sum(CASE WHEN dr = 1 THEN n_tok ELSE 0 END) * 1000000000
       |    // greatest(sum(n_tok), 1) AS BIGINT) AS drop_share_n9
       |FROM d
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (s, dir) =>
    val drops = graft.sources.ClusterAssignment(s, dir)
      .filter(col("cluster_strong").isNotNull &&
        col("doc_id") =!= col("cluster_strong"))
      .select(col("doc_id"), lit(1L).as("dr"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), size(tokens("text")).cast("long").as("n_tok"))
      .join(drops, Seq("doc_id"), "left")
      .withColumn("dr", coalesce(col("dr"), lit(0L)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("dr")).cast("long").as("n_dropped"),
        sum(col("n_tok")).cast("long").as("tok_total"),
        sum(when(col("dr") === 1L, col("n_tok")).otherwise(0L))
          .cast("long").as("tok_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"), col("tok_total"),
        col("tok_dropped"),
        expr("tok_dropped * 1000000000L div greatest(tok_total, 1L)")
          .as("drop_share_n9"))
      .orderBy("source")
  }

  /** Q113 — representative-quality regret: keep-minimum is
    * provenance-stable (the canonical id never changes as a cluster
    * grows) but QUALITY-BLIND — this prices that choice. Per strong
    * cluster: the kept doc is the minimum id, the best doc is the
    * quality argmax (q18's composite score, ties to the smaller id);
    * per cluster-size bucket: how many clusters kept their best member
    * anyway, and the summed/worst nano-quantized quality regret
    * (best − kept). A high-regret readout is the case for switching the
    * canonical rule to keep-best (paying re-keying on refresh); a
    * near-zero one says min-id is free. Regret quantization is exact:
    * q18's score doubles are bit-identical cross-engine (its own hash
    * compare proves it), so floor((best−kept)·10⁹+0.5) matches bitwise.
    *
    * Plan shape: the sixth ClusterAssignment consumer — strong labels
    * joined onto q18's MAP-ONLY quality projection of the corpus, a
    * per-cluster window over the tiny labeled slice (partitioned on
    * cluster id, never corpus-keyed), then a ≤|sizes| bucket group. The
    * oracle recomputes components and the score from scratch.
    */
  val q113RepresentativeRegret: QueryDef = QueryDef.sql(
    "q113_representative_regret",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |q AS (
       |${TextOps.QualityScoreSql}
       |),
       |m AS (
       |  SELECT l.cluster_id, l.doc_id, q.quality_score,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.quality_score DESC, l.doc_id) AS rn
       |  FROM lbl l JOIN q ON q.doc_id = l.doc_id),
       |cl AS (
       |  SELECT cluster_id, count(*) AS sz,
       |    max(CASE WHEN rn = 1 THEN doc_id END) AS best_doc,
       |    max(CASE WHEN rn = 1 THEN quality_score END) AS best_q,
       |    max(CASE WHEN doc_id = cluster_id THEN quality_score END) AS kept_q
       |  FROM m
       |  GROUP BY 1)
       |SELECT CAST(sz AS BIGINT) AS cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sum(CASE WHEN best_doc = cluster_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_best,
       |  CAST(sum(CAST(floor((best_q - kept_q) * 1000000000 + 0.5) AS BIGINT))
       |    AS BIGINT) AS sum_regret_n9,
       |  CAST(max(CAST(floor((best_q - kept_q) * 1000000000 + 0.5) AS BIGINT))
       |    AS BIGINT) AS max_regret_n9
       |FROM cl
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val cc = graft.sources.ClusterAssignment.strongComponents(s, dir)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
    val q = TextOps.textQualityFrame(Tables(s, dir, "documents"))
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val m = cc.join(q, "doc_id")
      .withColumn("rn", row_number().over(w))
    val cl = m.groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"),
        max(when(col("rn") === 1, col("doc_id"))).as("best_doc"),
        max(when(col("rn") === 1, col("quality_score"))).as("best_q"),
        max(when(col("doc_id") === col("cluster_id"), col("quality_score")))
          .as("kept_q"))
    val regret = floor((col("best_q") - col("kept_q")) * lit(1000000000L) + lit(0.5))
      .cast("long")
    cl
      .groupBy(col("sz").cast("long").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("best_doc") === col("cluster_id"), 1L).otherwise(0L))
          .cast("long").as("n_kept_best"),
        sum(regret).cast("long").as("sum_regret_n9"),
        max(regret).as("max_regret_n9"))
      .orderBy("cluster_size")
  }

  /** Q114 — the keep-BEST canonical corpus: q63's deliverable under the
    * quality-argmax keep rule q113 prices — each strong cluster keeps
    * its q18-quality argmax (ties to the smaller id) instead of its
    * minimum id; unpaired docs keep themselves. This is the DECISION
    * LEVER next to q113's meter: the regret readout says what switching
    * buys, this query (and the `canonical: best` knob on the near_dedup
    * stage, the same [[graft.operators.Components.dropSet]] machinery)
    * is the switch. Both canonical policies stay registered because they
    * trade differently: min-id is provenance-stable under refresh (the
    * canonical id of a growing cluster never changes), best re-keys when
    * a better member arrives — the reference's configurable
    * source/transform policy surface is the precedent
    * (caffe-grid/src/main/scala/com/yahoo/ml/caffe/Config.scala:403-499).
    *
    * Plan shape: the ClusterAssignment layout's strong labels joined
    * onto q18's MAP-ONLY quality projection, a per-cluster window over
    * the tiny labeled slice (q113's shape), then q63's anti-join — the
    * corpus never shuffles on cluster keys. The oracle recomputes
    * components and the score from scratch (q101's discipline); the
    * cross-engine argmax is exact because q18's score doubles are
    * bit-identical (q113's determinism note).
    */
  val q114CanonicalBest: QueryDef = QueryDef.sql(
    "q114_canonical_best",
    s"""WITH RECURSIVE pairsq AS (
       |${TextOps.q21NgramJaccard.oracle.get}
       |),
       |strong AS (SELECT a, b FROM pairsq WHERE jaccard >= 0.5),
       |e AS (SELECT a AS x, b AS y FROM strong UNION SELECT b AS x, a AS y FROM strong),
       |reach AS (
       |  SELECT x, y FROM e
       |  UNION
       |  SELECT r.x, e2.y FROM reach r JOIN e e2 ON r.y = e2.x),
       |lbl AS (
       |  SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
       |q AS (
       |${TextOps.QualityScoreSql}
       |),
       |m AS (
       |  SELECT l.cluster_id, l.doc_id,
       |    row_number() OVER (PARTITION BY l.cluster_id
       |      ORDER BY q.quality_score DESC, l.doc_id) AS rn
       |  FROM lbl l JOIN q ON q.doc_id = l.doc_id),
       |drops AS (SELECT doc_id FROM m WHERE rn > 1)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val labels = graft.sources.ClusterAssignment.strongComponents(s, dir)
    val scores = TextOps.textQualityFrame(docs)
      .select(col("doc_id").as("id"), col("quality_score").as("score"))
    val drop = graft.operators.Components.dropSet(labels, Some(scores))
      .select(col("id").as("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Q116 — fingerprint-set size profile: how many docs carry each
    * distinct-shingle-set size — the [[graft.sources.DocFingerprints]]
    * layout's independent audit (q100/q107 consume the sets pairwise;
    * this views the per-doc distribution). The operational reads: the
    * exact-Jaccard verify cost per candidate is O(|a|+|b|) — this table
    * IS that cost's distribution; and the left tail (tiny sets) flags
    * docs whose near-dup signal is statistically weak (a 2-shingle doc
    * matching 1 shingle jumps straight to jaccard ≥ 0.33), the
    * min-length floor a dedup config should set.
    *
    * Plan shape at 100 TB: a layout scan projecting size(fps) into a
    * ≤|max doc length|-row map-side-combined group — no shingling, no
    * pairs, nothing corpus-scale at query time. The oracle recomputes
    * the sets from the corpus (q101's discipline).
    */
  val q116FingerprintProfile: QueryDef = QueryDef.sql(
    "q116_fingerprint_profile",
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, ${FingerprintSql("s")} AS fp
       |  FROM (SELECT doc_id, $WordBigramsOverT AS bg
       |        FROM (SELECT doc_id, $ToksSql AS t FROM documents)) x,
       |       unnest(x.bg) AS u(s)),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps FROM sh GROUP BY doc_id)
       |SELECT n_fps, CAST(count(*) AS BIGINT) AS n_docs
       |FROM sz
       |GROUP BY n_fps
       |ORDER BY n_fps""".stripMargin) { (s, dir) =>
    graft.sources.DocFingerprints(s, dir)
      .select(size(col("fps")).cast("long").as("n_fps"))
      .groupBy("n_fps").agg(count(lit(1)).as("n_docs"))
      .orderBy("n_fps")
  }

  val all: Seq[QueryDef] =
    Seq(q31MinhashLsh, q32Simhash, q39SimhashNeardup, q62DedupClusters,
      q63CanonicalCorpus, q67SpanDedup, q68LeakageSafeSplit, q74Semdedup,
      q98SourceDupMatrix, q100MinhashCalibration, q101DedupSavings,
      q104ClusterPurity, q107SimhashCalibration, q109ClusterDensity,
      q111SourceDedupCost, q113RepresentativeRegret, q114CanonicalBest,
      q116FingerprintProfile)
}
