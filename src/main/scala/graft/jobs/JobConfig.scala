package graft.jobs

/** Declarative job configuration — the reference's config-as-schema role
  * (caffe-grid/src/main/scala/com/yahoo/ml/caffe/Config.scala:64-87: a
  * solver/net prototxt declaring the data source, format and column wiring,
  * parsed and VALIDATED at startup before any cluster work starts). The
  * graft twin is a small JSON document instead of prototxt: Spark-native
  * jobs wire DataFrames, so the config declares where the frame comes from
  * (path/format/table), which columns play id/feature/label, the model
  * dimensionality, and the gradient-descent hyper-parameters that
  * Config.scala reads out of SolverParameter.
  *
  * Example:
  * {{{
  * {
  *   "source":    {"path": "/data/train", "format": "parquet",
  *                 "idCol": "vec_id", "featureCol": "embedding", "labelCol": "label"},
  *   "validation":{"path": "/data/val"},
  *   "dim": 64, "lr": 0.5, "iters": 40, "l2": 1e-4, "validateEvery": 10,
  *   "model": "/models/lr", "output": "/out/features", "outputFormat": "json"
  * }
  * }}}
  *
  * The run MODE (-train / -features / -test) comes from the CLI like the
  * reference's (Config.scala:440-442), not the file — the same document
  * drives the whole train → features → test lifecycle.
  */
final case class SourceSpec(
    path: String,
    format: String = "parquet",
    table: String = "",
    idCol: String = "vec_id",
    featureCol: String = "embedding",
    labelCol: String = "label") {
  /** Resolved data location: `table` set means `path` is a directory of
    * `<table>.parquet` tables (the Tables layout); empty means `path` IS
    * the dataset.
    */
  def dataPath: String = if (table.nonEmpty) s"$path/$table.parquet" else path
}

/** One declared curation stage: an op name from
  * [[CurationStages.Ops]] plus its parameters (validated at parse time;
  * the accessors below are for the already-validated runtime read).
  */
final case class StageSpec(op: String, params: Map[String, Any] = Map.empty) {
  private def missing(k: String): Nothing = throw new IllegalArgumentException(
    s"job config: stage '$op' requires parameter '$k'")
  def str(k: String): String =
    params.get(k).map(_.asInstanceOf[String]).getOrElse(missing(k))
  def strOr(k: String, dflt: String): String =
    params.get(k).map(_.asInstanceOf[String]).getOrElse(dflt)
  def dbl(k: String, dflt: Double): Double =
    params.get(k).map(_.asInstanceOf[Double]).getOrElse(dflt)
  def int(k: String): Int =
    params.get(k).map(_.asInstanceOf[Double].toInt).getOrElse(missing(k))
  def int(k: String, dflt: Int): Int =
    params.get(k).map(_.asInstanceOf[Double].toInt).getOrElse(dflt)
  def bool(k: String, dflt: Boolean): Boolean =
    params.get(k).map(_.asInstanceOf[Boolean]).getOrElse(dflt)
  def ratesMap: Map[String, Long] =
    params.get("rates").map(_.asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> v.asInstanceOf[Double].toLong })
      .getOrElse(Map.empty)
}

/** Declared input normalization — the reference's transform_param block
  * (scale / mean_value / mean_file, prototxt e.g. data/lrcn_cos.prototxt:
  * 33-39, applied by FloatDataTransformer): feature vectors become
  * `(x − mean) · scale` before train/features/test. `meanValues` is the
  * per-channel mean_value mode (cycled over the vector, matching
  * interleaved HWC layouts); `computeMean=true` is the mean_file mode —
  * the per-element corpus mean is computed from the training source at
  * -train (VectorMean, one pass) and persisted next to the model like
  * compute_image_mean's blob, then loaded by -features/-test.
  */
final case class TransformSpec(
    scale: Double = 1.0,
    meanValues: Seq[Double] = Nil,
    computeMean: Boolean = false)

final case class JobConfig(
    source: SourceSpec,
    dim: Int,
    classes: Int = 2,
    validation: Option[SourceSpec] = None,
    lr: Double = 1.0,
    iters: Int = 50,
    l2: Double = 1e-4,
    validateEvery: Int = 10,
    model: String = "",
    output: String = "",
    outputFormat: String = "json",
    stages: Seq[StageSpec] = Nil,
    transform: Option[TransformSpec] = None,
    featureBlobs: Seq[String] = Nil)

object JobConfig {

  /** Parse + validate, failing at startup like the reference's Config
    * constructor — a malformed declaration must never reach the cluster.
    */
  def load(path: String): JobConfig =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def fromJson(text: String): JobConfig = {
    val root = Json.parse(text) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => fail(s"config root must be a JSON object, got $other")
    }
    val known = Set("source", "validation", "dim", "classes", "lr", "iters", "l2",
      "validateEvery", "model", "output", "outputFormat", "stages", "transform",
      "featureBlobs")
    val unknown = root.keySet -- known
    if (unknown.nonEmpty) fail(s"unknown config keys: ${unknown.mkString(", ")}")

    def sourceSpec(v: Any, label: String): SourceSpec = v match {
      case m: Map[String @unchecked, Any @unchecked] =>
        val sKnown = Set("path", "format", "table", "idCol", "featureCol", "labelCol")
        val sUnknown = m.keySet -- sKnown
        if (sUnknown.nonEmpty) fail(s"unknown $label keys: ${sUnknown.mkString(", ")}")
        val d = SourceSpec(path = "")
        val s = SourceSpec(
          path = str(m, "path", ""),
          format = str(m, "format", d.format),
          table = str(m, "table", d.table),
          idCol = str(m, "idCol", d.idCol),
          featureCol = str(m, "featureCol", d.featureCol),
          labelCol = str(m, "labelCol", d.labelCol))
        if (s.path.isEmpty) fail(s"$label.path is required")
        if (!Set("parquet", "json", "csv", "orc").contains(s.format))
          fail(s"$label.format must be parquet/json/csv/orc, got '${s.format}'")
        s
      case other => fail(s"$label must be a JSON object, got $other")
    }

    def stageSpec(v: Any, idx: Int): StageSpec = v match {
      case m: Map[String @unchecked, Any @unchecked] =>
        val op = m.getOrElse("op",
          fail(s"stages[$idx] needs an 'op' field")) match {
          case s: String => s
          case other => fail(s"stages[$idx].op must be a string, got $other")
        }
        val allowed = graft.jobs.CurationStages.Ops.getOrElse(op,
          fail(s"stages[$idx]: unknown op '$op' (known: " +
            s"${graft.jobs.CurationStages.Ops.keys.toSeq.sorted.mkString(", ")})"))
        val params = m - "op"
        val unknownP = params.keySet -- allowed
        if (unknownP.nonEmpty)
          fail(s"stages[$idx] ($op): unknown parameters ${unknownP.mkString(", ")}")
        def num(k: String)(check: Double => Boolean, what: String): Unit =
          params.get(k).foreach {
            case n: Double => if (!check(n)) fail(s"stages[$idx] ($op): $k $what, got $n")
            case other => fail(s"stages[$idx] ($op): $k must be a number, got $other")
          }
        def reqStr(k: String): Unit = params.get(k) match {
          case Some(_: String) => ()
          case Some(other) => fail(s"stages[$idx] ($op): $k must be a string, got $other")
          case None => fail(s"stages[$idx] ($op): $k is required")
        }
        def optStr(k: String): Unit = params.get(k).foreach {
          case _: String => ()
          case other => fail(s"stages[$idx] ($op): $k must be a string, got $other")
        }
        op match {
          case "near_dedup" =>
            // the floor is the pair relation's own jaccard cutoff
            // (CurationStages.NearDedupFloor): a declared threshold below
            // it would silently behave as the floor — refuse it loudly
            num("threshold")(t =>
              t >= graft.jobs.CurationStages.NearDedupFloor && t <= 1d,
              s"must be in [${graft.jobs.CurationStages.NearDedupFloor}, 1] " +
                "(the n-gram pair relation's jaccard floor)")
          case "embed_near_dedup" =>
            optStr("embeddings"); optStr("idCol"); optStr("embeddingCol")
            num("dim")(n => n.isWhole && n >= 1, "must be a positive integer")
            num("bands")(n => n.isWhole && n >= 1, "must be a positive integer")
            num("bitsPerBand")(n => n.isWhole && n >= 1, "must be a positive integer")
            num("minDot")(_ => true, "")
            val geo = params.get("bands").map(_.asInstanceOf[Double].toInt).getOrElse(4) *
              params.get("bitsPerBand").map(_.asInstanceOf[Double].toInt).getOrElse(4)
            if (geo > 63)
              fail(s"stages[$idx] ($op): bands*bitsPerBand must be <= 63, got $geo")
          case "image_near_dedup" =>
            num("maxHamming")(n => n.isWhole && n >= 0 && n <= 3,
              "must be an integer 0..3 (4x16-bit banding is exact only to 3)")
          case "semantic_dedup" =>
            optStr("embeddings"); optStr("idCol"); optStr("embeddingCol")
            num("clusters")(n => n.isWhole && n >= 1, "must be a positive integer")
            // unit vectors self-dot to ~1: a tau at or above that would
            // defeat the identical-vector collapse's self-dot gate
            num("minDot")(t => t < 0.99, "must be below 0.99 " +
              "(unit-norm self-dot must clear it — see semdedupDrops)")
          case "multimodal_join" =>
            optStr("embeddings"); optStr("idCol"); optStr("embeddingCol")
            params.get("how").foreach {
              case "inner" | "left" => ()
              case other => fail(
                s"stages[$idx] ($op): how must be 'inner' or 'left', got $other")
            }
            params.get("broadcast").foreach {
              case _: Boolean => ()
              case other => fail(
                s"stages[$idx] ($op): broadcast must be true/false, got $other")
            }
          case "decontaminate" =>
            reqStr("holdoutSource")
            num("minShared")(n => n.isWhole && n >= 1, "must be a positive integer")
          case "blocklist_filter" =>
            params.get("terms").foreach {
              case s: String if s.split(",").exists(_.trim.nonEmpty) => ()
              case other => fail(s"stages[$idx] ($op): terms must be a " +
                s"non-empty comma-separated string, got $other")
            }
          case "quality_filter" =>
            num("minScore")(_ => true, "")
          case "perplexity_filter" =>
            num("maxPercentile")(p => p > 0d && p < 1d, "must be in (0,1)")
            // each vocab word is one codegen'd array pass per doc AND one
            // score term — an unbounded V would blow up the generated code
            num("vocabSize")(n => n.isWhole && n >= 1 && n <= 128,
              "must be an integer 1..128")
          case "stratified_sample" =>
            num("default")(n => n.isWhole && n >= 0 && n <= 100, "must be an integer 0..100")
            params.get("rates").foreach {
              case rm: Map[String @unchecked, Any @unchecked] => rm.foreach {
                case (_, r: Double) if r.isWhole && r >= 0 && r <= 100 => ()
                case (l, r) => fail(s"stages[$idx] ($op): rate for '$l' must be an integer 0..100, got $r")
              }
              case other => fail(s"stages[$idx] ($op): rates must be an object, got $other")
            }
          case "importance_resample" =>
            num("budgetDocs")(n => n.isWhole && n >= 1, "must be a positive integer")
            params.get("targetSources").foreach {
              case s: String if s.split(",").exists(_.trim.nonEmpty) => ()
              case other => fail(s"stages[$idx] ($op): targetSources must be a " +
                s"non-empty comma-separated string, got $other")
            }
          case "temperature_mix" =>
            num("alpha")(_ > 0d, "must be positive")
            params.get("budgetDocs") match {
              case Some(n: Double) if n.isWhole && n >= 1 => ()
              case Some(other) => fail(s"stages[$idx] ($op): budgetDocs must be a positive integer, got $other")
              case None => fail(s"stages[$idx] ($op): budgetDocs is required")
            }
          case "pack" =>
            num("tokenBudget")(n => n.isWhole && n >= 1, "must be a positive integer")
          case "assign_split" =>
            num("trainPct")(n => n.isWhole && n > 0 && n <= 100, "must be an integer 1..100")
            num("valPct")(n => n.isWhole && n >= 0 && n < 100, "must be an integer 0..99")
            params.get("splitFrom").foreach {
              case "flow" | "corpus" => ()
              case other => fail(
                s"stages[$idx] ($op): splitFrom must be 'flow' or 'corpus', got $other")
            }
          case "whiten" =>
            optStr("embeddingCol")
          case "quantize" =>
            optStr("embeddingCol")
          case "pq_encode" =>
            optStr("embeddingCol")
          case "bpe_annotate" =>
            params.get("mergesFrom").foreach {
              case "flow" | "corpus" => ()
              case other => fail(
                s"stages[$idx] ($op): mergesFrom must be 'flow' or 'corpus', got $other")
            }
          case _ => () // exact_dedup / pii_scrub: no parameters
        }
        StageSpec(op, params)
      case other => fail(s"stages[$idx] must be a JSON object, got $other")
    }

    val d = JobConfig(source = SourceSpec("_defaults_"), dim = 1)
    val cfg = JobConfig(
      source = sourceSpec(root.getOrElse("source", fail("source is required")), "source"),
      validation = root.get("validation").map(sourceSpec(_, "validation")),
      dim = int(root, "dim", 0),
      classes = int(root, "classes", d.classes),
      lr = dbl(root, "lr", d.lr),
      iters = int(root, "iters", d.iters),
      l2 = dbl(root, "l2", d.l2),
      validateEvery = int(root, "validateEvery", d.validateEvery),
      model = str(root, "model", d.model),
      output = str(root, "output", d.output),
      outputFormat = str(root, "outputFormat", d.outputFormat),
      stages = root.get("stages") match {
        case Some(l: List[Any @unchecked]) =>
          l.zipWithIndex.map { case (v, i) => stageSpec(v, i) }
        case Some(other) => fail(s"stages must be a JSON array, got $other")
        case None => Nil
      },
      // the reference's features-mode blob-name list (CLI `-features
      // accuracy,ip1,ip2` → here a declared subset of the net's outputs;
      // empty = all blobs, the historical behavior)
      featureBlobs = root.get("featureBlobs") match {
        case Some(l: List[Any @unchecked]) => l.map {
          case s: String if Set("ip1", "prob")(s) => s
          case other => fail(
            s"featureBlobs entries must be 'ip1' or 'prob' (the linear head's " +
              s"output blobs), got $other")
        }
        case Some(other) => fail(s"featureBlobs must be a JSON array, got $other")
        case None => Nil
      },
      transform = root.get("transform").map {
        case m: Map[String @unchecked, Any @unchecked] =>
          val tKnown = Set("scale", "meanValues", "computeMean")
          val tUnknown = m.keySet -- tKnown
          if (tUnknown.nonEmpty) fail(s"unknown transform keys: ${tUnknown.mkString(", ")}")
          val td = TransformSpec()
          val t = TransformSpec(
            scale = dbl(m, "scale", td.scale),
            meanValues = m.get("meanValues") match {
              case Some(l: List[Any @unchecked]) => l.map {
                case n: Double => n
                case other => fail(s"transform.meanValues must be numbers, got $other")
              }
              case Some(other) => fail(s"transform.meanValues must be an array, got $other")
              case None => Nil
            },
            computeMean = m.get("computeMean") match {
              case Some(b: Boolean) => b
              case Some(other) => fail(s"transform.computeMean must be true/false, got $other")
              case None => td.computeMean
            })
          if (t.computeMean && t.meanValues.nonEmpty)
            fail("transform: computeMean and meanValues are mutually exclusive " +
              "(mean_file vs mean_value, like the reference transformer)")
          if (t.scale == 0d) fail("transform.scale must be non-zero")
          t
        case other => fail(s"transform must be a JSON object, got $other")
      })
    // dim drives the model lifecycle; a pure curation pipeline (stages
    // declared) doesn't have one
    if (cfg.stages.isEmpty && cfg.dim <= 0)
      fail(s"dim must be a positive integer, got ${cfg.dim}")
    if (cfg.dim < 0) fail(s"dim must not be negative, got ${cfg.dim}")
    // 2 = the binary sigmoid head; > 2 = the multi-output softmax head
    if (cfg.classes < 2) fail(s"classes must be >= 2, got ${cfg.classes}")
    if (cfg.iters <= 0) fail(s"iters must be positive, got ${cfg.iters}")
    if (cfg.lr <= 0d) fail(s"lr must be positive, got ${cfg.lr}")
    if (cfg.l2 < 0d) fail(s"l2 must be non-negative, got ${cfg.l2}")
    if (cfg.validateEvery <= 0) fail(s"validateEvery must be positive, got ${cfg.validateEvery}")
    if (!Set("json", "parquet", "csv").contains(cfg.outputFormat))
      fail(s"outputFormat must be json/parquet/csv, got '${cfg.outputFormat}'")
    cfg
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"job config: $msg")

  private def str(m: Map[String, Any], k: String, dflt: String): String =
    m.get(k).map {
      case s: String => s
      case other => fail(s"$k must be a string, got $other")
    }.getOrElse(dflt)

  private def dbl(m: Map[String, Any], k: String, dflt: Double): Double =
    m.get(k).map {
      case n: Double => n
      case other => fail(s"$k must be a number, got $other")
    }.getOrElse(dflt)

  private def int(m: Map[String, Any], k: String, dflt: Int): Int =
    m.get(k).map {
      case n: Double if n.isWhole && n.abs <= Int.MaxValue => n.toInt
      case other => fail(s"$k must be an integer, got $other")
    }.getOrElse(dflt)
}

/** Minimal strict JSON reader for config documents — objects, arrays,
  * strings (with escapes), numbers (as Double), booleans, null. No
  * dependency beyond the JDK; ~the grammar, nothing else (duplicate keys
  * rejected, trailing garbage rejected).
  */
private[graft] object Json {

  def parse(text: String): Any = {
    val p = new Parser(text)
    p.ws()
    val v = p.value()
    p.ws()
    if (!p.eof) p.err("trailing characters after the JSON document")
    v
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"job config JSON at offset $i: $msg")
    def ws(): Unit = while (!eof && Character.isWhitespace(s.charAt(i))) i += 1
    private def peek: Char = { if (eof) err("unexpected end of input"); s.charAt(i) }
    private def expect(c: Char): Unit =
      if (eof || s.charAt(i) != c) err(s"expected '$c'") else i += 1

    def value(): Any = peek match {
      case '{' => obj()
      case '[' => arr()
      case '"' => string()
      case 't' => lit("true", true)
      case 'f' => lit("false", false)
      case 'n' => lit("null", null)
      case c if c == '-' || (c >= '0' && c <= '9') => number()
      case c => err(s"unexpected character '$c'")
    }

    private def lit(word: String, v: Any): Any =
      if (s.regionMatches(i, word, 0, word.length)) { i += word.length; v }
      else err(s"expected '$word'")

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      var m = Map.empty[String, Any]
      if (peek == '}') { i += 1; return m }
      var done = false
      while (!done) {
        ws()
        val k = string()
        if (m.contains(k)) err(s"duplicate key '$k'")
        ws(); expect(':'); ws()
        m += k -> value()
        ws()
        peek match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c => err(s"expected ',' or '}', got '$c'")
        }
      }
      m
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (peek == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws()
        b += value()
        ws()
        peek match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case c => err(s"expected ',' or ']', got '$c'")
        }
      }
      b.result()
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (peek != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          peek match {
            case '"' => sb += '"'; i += 1
            case '\\' => sb += '\\'; i += 1
            case '/' => sb += '/'; i += 1
            case 'n' => sb += '\n'; i += 1
            case 't' => sb += '\t'; i += 1
            case 'r' => sb += '\r'; i += 1
            case 'b' => sb += '\b'; i += 1
            case 'f' => sb += '\f'; i += 1
            case 'u' =>
              if (i + 5 > s.length) err("truncated \\u escape")
              val hex = s.substring(i + 1, i + 5)
              if (!hex.forall(c =>
                (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
                err(s"bad \\u escape '\\u$hex'")
              sb += Integer.parseInt(hex, 16).toChar
              i += 5
            case c2 => err(s"bad escape '\\$c2'")
          }
        } else { sb += c; i += 1 }
      }
      i += 1
      sb.toString
    }

    private def number(): Double = {
      val start = i
      if (peek == '-') i += 1
      while (!eof && { val c = s.charAt(i)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-' }) i += 1
      val t = s.substring(start, i)
      try t.toDouble
      catch { case _: NumberFormatException => err(s"bad number '$t'") }
    }
  }
}
