package graft.jobs

import graft.Graft
import graft.ml.TrainConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI entry point — the reference driver's `spark-submit ... -train -conf
  * solver.prototxt` contract (caffe-grid/.../CaffeOnSpark.scala:27-84: mode
  * flags select train / feature-extraction / test over the declared source;
  * Config.scala:409-449 the flag surface). Usage:
  *
  * {{{
  * spark-submit --class graft.jobs.JobRunner graft.jar \
  *   -train -conf job.json [-model /models/lr]
  *   -features -conf job.json [-model /models/lr] [-output /out] [-outputFormat parquet]
  *   -test -conf job.json [-model /models/lr] [-output /out/test_result.json]
  *   -curate -conf pipeline.json [-output /out]   // stages: [...] jobs (CurationStages)
  *   -ingest -conf job.json [-from /prev/corpus]  // build all derived layouts
  *                                                // (-from: append-delta refresh)
  * }}}
  *
  * Mode flags mirror the reference's: `-train` fits and snapshots weights to
  * `model`; `-features` loads weights and writes the forward-pass frame to
  * `output` in `outputFormat`; `-test` loads weights and writes the metric
  * map as one JSON document (the reference's test_result file,
  * CaffeOnSpark.scala:62-80). CLI `-model/-output/-outputFormat` override
  * the config file's fields, so one document drives the whole lifecycle.
  * Like the reference, `-train -test` in one invocation trains first, then
  * tests with the freshly-snapshotted weights.
  */
object JobRunner {

  final case class Invocation(
      cfg: JobConfig, train: Boolean, features: Boolean, test: Boolean,
      curate: Boolean = false, ingest: Boolean = false,
      ingestFrom: Option[String] = None)

  /** Parse argv + config file, failing before any cluster work (the
    * reference validates flags/proto at Config construction).
    */
  def parse(args: Array[String]): Invocation = {
    var conf = ""
    var train = false; var features = false; var test = false
    var curate = false
    var ingest = false
    var ingestFrom: Option[String] = None
    var model: Option[String] = None
    var output: Option[String] = None
    var outputFormat: Option[String] = None
    var featureBlobs: Option[Seq[String]] = None
    var i = 0
    def optValue(flag: String): String = {
      i += 1
      if (i >= args.length) usage(s"$flag requires a value")
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "-train" => train = true
        case "-features" => features = true
        case "-test" => test = true
        case "-curate" => curate = true
        case "-ingest" => ingest = true
        case "-from" => ingestFrom = Some(optValue("-from"))
        case "-conf" => conf = optValue("-conf")
        case "-model" => model = Some(optValue("-model"))
        case "-output" => output = Some(optValue("-output"))
        case "-outputFormat" => outputFormat = Some(optValue("-outputFormat"))
        case "-featureBlobs" =>
          // the reference passes blob names with its -features flag;
          // values re-validate through the config's rule below
          featureBlobs = Some(optValue("-featureBlobs").split(",").toSeq
            .map(_.trim).filter(_.nonEmpty))
        case other => usage(s"unknown argument '$other'")
      }
      i += 1
    }
    if (conf.isEmpty) usage("-conf <job.json> is required")
    if (!train && !features && !test && !curate && !ingest)
      usage("at least one of -train / -features / -test / -curate / -ingest is required")
    if (ingestFrom.nonEmpty && !ingest)
      usage("-from only applies with -ingest")
    var cfg = JobConfig.load(conf)
    model.foreach(m => cfg = cfg.copy(model = m))
    output.foreach(o => cfg = cfg.copy(output = o))
    outputFormat.foreach(f => cfg = cfg.copy(outputFormat = f))
    featureBlobs.foreach { bs =>
      bs.find(b => !Set("ip1", "prob")(b)).foreach(b =>
        usage(s"-featureBlobs: unknown blob '$b' (the linear head emits ip1, prob)"))
      cfg = cfg.copy(featureBlobs = bs)
    }
    if ((train || features || test) && cfg.model.isEmpty)
      usage("a model path is required (config 'model' or CLI -model)")
    if ((train || features || test) && cfg.dim <= 0)
      usage("-train/-features/-test need a positive 'dim' in the config")
    if ((features || test || curate) && cfg.output.isEmpty)
      usage("-features/-test/-curate need an output path (config 'output' or CLI -output)")
    if (curate && cfg.stages.isEmpty)
      usage("-curate needs a non-empty 'stages' array in the config")
    if (ingest && cfg.source.table.isEmpty)
      usage("-ingest needs a table-dir source (source.table) to locate " +
        "documents/embeddings for the derived layouts")
    Invocation(cfg, train, features, test, curate, ingest, ingestFrom)
  }

  private def usage(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"$msg\nusage: JobRunner (-train|-features|-test|-curate)+ -conf job.json " +
        "[-model path] [-output path] [-outputFormat json|parquet|csv]")

  private def readSource(spark: SparkSession, s: SourceSpec): DataFrame =
    spark.read.format(s.format).load(s.dataPath)

  /** Where a computed corpus mean persists, next to the model weights —
    * the compute_image_mean blob of the declared transform.
    */
  private[jobs] def meanPath(model: String): String = s"$model.mean"

  /** Declared transform_param application ((x − mean) · scale over the
    * feature column, the P10 transformer stage) via the codegen'd
    * [[org.apache.spark.sql.graft.VecNormalize]] — stays inside the same
    * whole-stage-codegen span as the forward pass's dot.
    */
  private def normalized(df: DataFrame, featCol: String, mean: Array[Float],
      scale: Float): DataFrame =
    df.withColumn(featCol, org.apache.spark.sql.graft.VectorExpressions
      .vec_normalize(org.apache.spark.sql.functions.col(featCol),
        mean.toSeq, scale))

  /** Resolve the declared transform's mean for this run mode: mean_value
    * literals straight from the config; computeMean = the per-element
    * corpus mean of the TRAINING source (VectorMean, one distributed
    * pass), computed and persisted at -train, loaded by -features/-test so
    * every stage of the lifecycle applies the identical mean.
    */
  private def resolveMean(spark: SparkSession, cfg: JobConfig,
      t: graft.jobs.TransformSpec, training: Option[DataFrame]): Array[Float] =
    if (!t.computeMean) t.meanValues.map(_.toFloat).toArray
    else training match {
      case Some(raw) =>
        val vm = org.apache.spark.sql.functions.udaf(new graft.agg.VectorMean(cfg.dim))
        val mean = raw.agg(vm(org.apache.spark.sql.functions.col(cfg.source.featureCol)))
          .head().getSeq[Double](0).toArray
        graft.ml.LogisticRegression.saveWeights(spark, mean, meanPath(cfg.model))
        mean.map(_.toFloat)
      case None =>
        graft.ml.LogisticRegression.loadWeights(spark, meanPath(cfg.model)).map(_.toFloat)
    }

  /** Session-injected body so tests (and notebook users) can run a declared
    * job without owning JVM-global session construction.
    */
  def run(spark: SparkSession, inv: Invocation): Unit = {
    val cfg = inv.cfg
    val src = cfg.source

    if (inv.ingest) {
      // corpus ingest: build every stamped derived layout for the source
      // table dir — the one-time pass production runs when data lands,
      // after which every query/stage reads the stores (exactly what
      // Bench's prebuild mimics). With -from <previousCorpusDir>, the
      // append-aware layers (shingle postings, bucketed embeddings)
      // build by DELTA MERGE against the previous corpus's layouts
      // instead of from scratch; the stamped result is identical either
      // way (DerivedRefreshSpec), so downstream layers and consumers
      // cannot tell which path ran.
      val dir = src.path
      inv.ingestFrom match {
        case Some(old) =>
          graft.sources.DocFingerprints.refreshed(spark, dir, old)
          graft.sources.TermStats.refreshed(spark, dir, old)
          graft.sources.ShinglePostings.refreshed(spark, dir, old)
          graft.sources.BucketedEmbeddings.refreshed(spark, dir, old)
        case None =>
          graft.sources.DocFingerprints(spark, dir)
          graft.sources.TermStats(spark, dir)
          graft.sources.ShinglePostings(spark, dir)
          graft.sources.BucketedEmbeddings(spark, dir)
      }
      // SpanStats/ChunkStats rebuild even on -from: their n_occ ≥ 2 gates
      // make delta merge impossible from the stored rows (see scaladocs)
      graft.sources.SpanStats(spark, dir)
      graft.sources.ChunkStats(spark, dir)
      graft.sources.CorpusStats.rowCount(spark, dir)
      graft.sources.CorpusStats.rowCount(spark, dir, "documents")
      graft.sources.PairGraph(spark, dir)
      // cluster labels: label-merge over the pair delta when the append
      // removed no edges, full CC otherwise (the exactness guard lives in
      // ClusterAssignment.refreshed)
      inv.ingestFrom match {
        case Some(old) => graft.sources.ClusterAssignment.refreshed(spark, dir, old)
        case None => graft.sources.ClusterAssignment(spark, dir)
      }
      graft.sources.SplitAssignment(spark, dir)
      graft.sources.IvfCentroids(spark, dir)
      graft.sources.PqCodebooks(spark, dir)
      graft.sources.BpeMerges(spark, dir)
      // BigramLm refresh is CONDITIONAL (merge only when the top-V vocab
      // provably survives, else rebuild — BigramLm.mergeable); either
      // path lands the same stamped model
      inv.ingestFrom match {
        case Some(old) => graft.sources.BigramLm.refreshed(spark, dir, old)
        case None => graft.sources.BigramLm.model(spark, dir)
      }
    }

    if (inv.curate) {
      // the declared stage chain over the declared source — the whole
      // curation dataflow from the document, no Scala wiring. A table-dir
      // source gives embed_near_dedup its default embeddings location
      // (sibling table, the Tables layout); a bare-path source must
      // declare the stage's 'embeddings' param itself.
      val embDefault =
        if (src.table.nonEmpty) Some(s"${src.path}/embeddings.parquet") else None
      // stage-internal persists (e.g. perplexity_filter's scoring frames)
      // are scoped to THIS job — release exactly those on exit, by diffing
      // the persisted-RDD set, so a SHARED long-lived session running
      // concurrent work keeps its own caches (Y5 discipline; the dedicated
      // CLI entrypoint still clearAll's at process end in main()).
      val before = graft.Caches.snapshot(spark)
      try CurationStages.run(spark.read.format(src.format).load(src.dataPath),
          cfg.stages, embeddingsDefault = embDefault,
          sourceDirDefault = if (src.table.nonEmpty) Some(src.path) else None)
        .write.mode("overwrite").format(cfg.outputFormat)
        .save(s"${cfg.output}/corpus")
      finally graft.Caches.clearCreatedSince(spark, before)
    }

    if (inv.train) trainJob(spark, cfg)

    if (inv.features)
      featuresFrame(spark, cfg).write.mode("overwrite").format(cfg.outputFormat)
        .save(s"${cfg.output}/features")

    if (inv.test) {
      // one small JSON document, like the reference's test_result file —
      // written through the job filesystem (FSUtils role) so hdfs://- and
      // s3://-style output URIs work under spark-submit, not just file://
      val json = testJson(spark, cfg)
      val out = new org.apache.hadoop.fs.Path(s"${cfg.output}/test_result.json")
      val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stream = fs.create(out, true)
      try stream.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally stream.close()
    }
  }

  private def graftOf(spark: SparkSession, cfg: JobConfig): Graft =
    new Graft(spark, cfg.dim,
      TrainConfig(lr = cfg.lr, iters = cfg.iters, l2 = cfg.l2,
        validateEvery = cfg.validateEvery),
      numClasses = cfg.classes)

  // features/test apply the model's transform: mean_value literals from
  // the config, a computed mean from the blob persisted at -train
  private def applyTransform(spark: SparkSession, cfg: JobConfig,
      df: DataFrame, featCol: String): DataFrame =
    cfg.transform match {
      case Some(t) =>
        val mean = resolveMean(spark, cfg, t, training = None)
        normalized(df, featCol, mean, t.scale.toFloat)
      case None => df
    }

  /** The -train leg for a validated config: fit (with optional interleaved
    * validation), persist the declared transform's computed mean, snapshot
    * weights to cfg.model. Shared by [[run]] and the py4j bridge.
    */
  private[jobs] def trainJob(spark: SparkSession, cfg: JobConfig): Unit = {
    val g = graftOf(spark, cfg)
    val src = cfg.source
    val raw = readSource(spark, src)
    // declared transform: the SAME (mean, scale) applies to the training
    // AND validation sources — normalizing train but not val would skew
    // every interleaved metric
    val norm: DataFrame => DataFrame = cfg.transform match {
      case Some(t) =>
        val mean = resolveMean(spark, cfg, t, training = Some(raw))
        normalized(_, src.featureCol, mean, t.scale.toFloat)
      case None => identity
    }
    val data = norm(raw)
    val weights = cfg.validation match {
      case Some(v) =>
        val (w, metrics) =
          g.trainWithValidation(data, norm(readSource(spark, v)), src.featureCol, src.labelCol)
        // validation metric frame rides along with the snapshot (the
        // reference's interleaved-validation output frame)
        if (cfg.output.nonEmpty)
          metrics.write.mode("overwrite").format(cfg.outputFormat)
            .save(s"${cfg.output}/validation_metrics")
        w
      case None => g.train(data, src.featureCol, src.labelCol)
    }
    g.save(weights, cfg.model)
  }

  /** The -features output frame (model loaded, declared transform applied,
    * declared blob subset selected — SampleID always rides; empty
    * declaration = all blobs). [[run]] writes it; the py4j bridge returns
    * it (the reference's features() returns the FRAME, CaffeOnSpark.py).
    */
  private[jobs] def featuresFrame(spark: SparkSession, cfg: JobConfig): DataFrame = {
    val g = graftOf(spark, cfg)
    val src = cfg.source
    val w = g.load(cfg.model)
    val full = g.features(
      applyTransform(spark, cfg, readSource(spark, src), src.featureCol),
      w, src.idCol, src.featureCol)
    if (cfg.featureBlobs.isEmpty) full
    else full.select(("SampleID" +: cfg.featureBlobs).map(
      org.apache.spark.sql.functions.col): _*)
  }

  /** The -test metric map rendered as the one JSON document (the
    * reference's test_result shape). Test evaluates the held-out source
    * when one is declared, falling back to the training source for
    * single-source jobs.
    */
  private[jobs] def testJson(spark: SparkSession, cfg: JobConfig): String = {
    val g = graftOf(spark, cfg)
    val w = g.load(cfg.model)
    val testSrc = cfg.validation.getOrElse(cfg.source)
    val metrics = g.test(
      applyTransform(spark, cfg, readSource(spark, testSrc), testSrc.featureCol),
      w, testSrc.idCol, testSrc.featureCol)
    metrics.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"""  "$k": ${vs.mkString("[", ", ", "]")}"""
    }.mkString("{\n", ",\n", "\n}\n")
  }

  // ---- py4j lifecycle bridge (python/graft.py) -----------------------------
  // The reference's CaffeOnSpark.py centers on train/features/test over a
  // declared config (caffe-grid/src/main/python/com/yahoo/ml/caffe/
  // CaffeOnSpark.py:28-63); these flat signatures are that surface for
  // py4j — one config path plus an optional model-path override per call
  // (empty string = keep the config's), the CLI's validation rules, and
  // features returning the FRAME (the reference returns a DataFrame, not
  // a written path). Train snapshots weights to the config's model path;
  // test returns the metric JSON for the Python side to parse.

  private def loadLifecycleCfg(confPath: String, model: String): JobConfig = {
    var cfg = JobConfig.load(confPath)
    if (model.nonEmpty) cfg = cfg.copy(model = model)
    if (cfg.model.isEmpty)
      usage("a model path is required (config 'model' or the model argument)")
    if (cfg.dim <= 0)
      usage("train/features/test need a positive 'dim' in the config")
    cfg
  }

  def trainFromConfig(spark: SparkSession, confPath: String, model: String): Unit =
    trainJob(spark, loadLifecycleCfg(confPath, model))

  def featuresFromConfig(spark: SparkSession, confPath: String, model: String): DataFrame =
    featuresFrame(spark, loadLifecycleCfg(confPath, model))

  def testFromConfig(spark: SparkSession, confPath: String, model: String): String =
    testJson(spark, loadLifecycleCfg(confPath, model))

  def main(args: Array[String]): Unit = {
    val inv = parse(args)
    val spark = SparkSession.builder()
      .appName("graft-job")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // dedicated CLI process: a full clear on exit is correct here (the
    // in-run release is job-scoped for shared-session callers of run())
    try run(spark, inv)
    finally {
      graft.Caches.clearAll(spark)
      spark.stop()
    }
  }
}
