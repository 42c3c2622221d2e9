"""Python surface for the graft engine — the reference's CaffeOnSpark.py
shape (caffe-grid/src/main/python/com/yahoo/ml/caffe/CaffeOnSpark.py)
re-expressed for a Spark-native library: no custom py4j wrapping layer,
because PySpark already IS the bridge. The Scala core is reached two ways:

  1. SQL: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
     registers every native expression/aggregate; the `functions` helpers
     here build Columns over them, so `df.select(gf.tokenize("text"))`
     works from plain PySpark with codegen'd Scala kernels underneath.
  2. py4j: `Graft(spark)` drives the driver contract (`graft.SparkEntry`)
     — the flagship entry, every registered query by name, and each
     query's DuckDB oracle SQL — wrapping results back into PySpark
     DataFrames exactly as the reference's Python API wraps its Scala
     DataFrames.

Usage:

    from graft import Graft, session
    from graft import functions as gf    # graft is a single module, not a package

    spark = session(classes="target/scala-2.13/classes")
    g = Graft(spark)
    g.entry().show()                      # flagship query
    g.query("q1_pricing_summary", "/root/testdata/sf0.001").show()
    spark.read.parquet(".../documents.parquet") \
        .select(gf.tokenize("text")).show()

Exercised end-to-end by tools/pyspark_smoke.py (the parity gate).
"""

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EXTENSIONS = "org.apache.spark.sql.graft.GraftExtensions"


def session(master="local[4]", classes=None, app_name="graft", conf=None):
    """A SparkSession wired for graft: extensions registered, the compiled
    Scala classes on the driver/executor classpath, UTC session timezone
    (the engine's determinism contract).

    :param classes: path to the compiled classes (or a jar). Omit when the
        classes are already on the JVM classpath.
    :param conf: optional dict of extra Spark conf entries.
    """
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.extensions", EXTENSIONS)
        .config("spark.sql.session.timeZone", "UTC")
    )
    if classes:
        b = b.config("spark.driver.extraClassPath", classes)
        b = b.config("spark.executor.extraClassPath", classes)
    for k, v in (conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


class Graft:
    """Handle on the Scala driver contract (graft.SparkEntry) via py4j —
    the CaffeOnSpark.py pattern: plain methods in, PySpark DataFrames out.
    """

    def __init__(self, spark):
        self._spark = spark
        self._entry = spark._jvm.graft.SparkEntry

    def entry(self):
        """The flagship query (driver smoke contract: rows > 0)."""
        return DataFrame(self._entry.entry(self._spark._jsparkSession), self._spark)

    def query_names(self):
        """All registered query names, sorted."""
        return list(self._entry.queryNames())

    def query(self, name, sf_dir):
        """Run one registered query against an sf directory of parquet
        tables (TESTDATA.md layout) and return a PySpark DataFrame.
        """
        return DataFrame(
            self._entry.runQuery(self._spark._jsparkSession, name, sf_dir),
            self._spark,
        )

    def oracle_sql(self, name):
        """The query's DuckDB oracle SQL ('' when rows-only checked)."""
        return self._entry.oracleFor(name)

    def clear_caches(self):
        """Release per-query persists (graft.Caches.clearAll)."""
        self._spark._jvm.graft.Caches.clearAll(self._spark._jsparkSession)

    # ---- ML lifecycle (the reference CaffeOnSpark.py core methods) --------
    # train/features/test driven by a JobConfig JSON path — the same
    # document the `graft.jobs.JobRunner` CLI runs, so a job declared once
    # drives Scala spark-submit AND this Python surface identically
    # (reference: CaffeOnSpark.py's train(cfg)/features(cfg)/test(cfg)).
    # `model` overrides the config's model path ('' keeps it).

    def train(self, conf, model=""):
        """Fit the declared job (optional interleaved validation), persist
        the declared transform's computed mean, and snapshot weights to the
        model path. Returns self for train→features→test chaining.
        """
        self._jobs().trainFromConfig(self._spark._jsparkSession, conf, model)
        return self

    def features(self, conf, model=""):
        """Forward-pass frame (SampleID + declared blobs) for the declared
        source, as a PySpark DataFrame — the reference's features() shape.
        """
        return DataFrame(
            self._jobs().featuresFromConfig(self._spark._jsparkSession, conf, model),
            self._spark,
        )

    def test(self, conf, model=""):
        """Held-out metrics as a dict {blob: [per-dim means]} — the
        reference's test_result document, parsed.
        """
        return json.loads(
            self._jobs().testFromConfig(self._spark._jsparkSession, conf, model))

    def _jobs(self):
        return self._spark._jvm.graft.jobs.JobRunner


class functions:
    """Column builders over the SQL-registered native expressions — the
    PySpark-side mirror of org.apache.spark.sql.graft.TextExpressions /
    VectorExpressions. Each returns a pyspark Column backed by the
    codegen'd Scala kernel (never a Python UDF); arguments may be column
    names or Columns.
    """

    @staticmethod
    def _c(col):
        """Column passthrough; str = column NAME; other values = literal."""
        if isinstance(col, Column):
            return col
        if isinstance(col, str):
            return F.col(col)
        return F.lit(col)

    @staticmethod
    def _call(fn, *cols):
        return F.call_function(fn, *[functions._c(c) for c in cols])

    # ---- text -------------------------------------------------------------
    @staticmethod
    def tokenize(col):
        """Lowercased [a-z0-9]+ token array (the engine's one tokenizer)."""
        return functions._call("tokenize", col)

    @staticmethod
    def shingle_hashes(col):
        """Word-bigram rolling-hash fingerprints."""
        return functions._call("shingle_hashes", col)

    @staticmethod
    def token_hashes(col):
        return functions._call("token_hashes", col)

    @staticmethod
    def rolling_hash(col):
        return functions._call("rolling_hash", col)

    @staticmethod
    def simhash32(col):
        return functions._call("simhash32", col)

    @staticmethod
    def ws_token_count(col):
        return functions._call("ws_token_count", col)

    @staticmethod
    def bpeish_token_count(col):
        return functions._call("bpeish_token_count", col)

    @staticmethod
    def token_length_sum(col):
        return functions._call("token_length_sum", col)

    @staticmethod
    def class_seq(tokens, vocab):
        """1-based vocab index per token (0 = OOV)."""
        return functions._call("class_seq", tokens, vocab)

    @staticmethod
    def bigram_nll(cls, cb, cu):
        """Interpolated class-bigram LM per-doc average -ln P (q118)."""
        return functions._call("bigram_nll", cls, cb, cu)

    @staticmethod
    def char_stats(col):
        """[n, k, sum(count^2)] over a string's code points (q120's gate)."""
        return functions._call("char_stats", col)

    @staticmethod
    def cdc_chunks(tokens, divisor):
        """Content-defined chunks cut at rolling hash == 0 (mod divisor)."""
        return functions._call("cdc_chunks", tokens, divisor)

    # ---- vectors ----------------------------------------------------------
    @staticmethod
    def float_dot(a, b):
        """Sequential-fold float dot product (the ANN scoring kernel)."""
        return functions._call("float_dot", a, b)

    @staticmethod
    def float_norm(col):
        return functions._call("float_norm", col)

    @staticmethod
    def vec_normalize(x, mean, scale):
        """(x[i] - mean[i % len(mean)]) * scale, one pass."""
        return functions._call("vec_normalize", x, mean, scale)

    # ---- multimodal -------------------------------------------------------
    @staticmethod
    def dhash64(col):
        """64-bit difference hash over a decoded 9x8 luma grid."""
        return functions._call("dhash64", col)

    @staticmethod
    def pcm_window_stats(col, win):
        return functions._call("pcm_window_stats", col, win)

    # ---- aggregates -------------------------------------------------------
    @staticmethod
    def sum128(col):
        """Overflow-proof 128-bit integer sum (emitted as DECIMAL)."""
        return functions._call("sum128", col)

    @staticmethod
    def percentile_long(col, p):
        return functions._call("percentile_long", col, p)
