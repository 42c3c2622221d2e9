#!/usr/bin/env python3
"""PySpark parity smoke gate.

The reference ships a Python API (CaffeOnSpark.py / ConversionUtil.py)
that wraps its Scala core via py4j. SURVEY drops that surface as
"PySpark's DataFrame/Arrow bridge is built in" -- this gate converts the
claim into a check: a stock PySpark session with
spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions must

  1. resolve the SQL-registered native expressions (tokenize, float_dot,
     sum128) from plain spark.sql with exact expected values,
  2. run the Scala driver contract through py4j (SparkEntry.entry and a
     registered query) and hand the result back as a PySpark DataFrame --
     the same wrapping pattern the reference's Python API uses,
  3. do both THROUGH the packaged python/graft.py module (Graft +
     graft.functions), so the module the README points Python users at is
     itself under the gate.

Run:  python3 tools/pyspark_smoke.py   (exits 0 on pass)
Requires `sbt compile` first (classes dir on the driver classpath).
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(ROOT, "target", "scala-2.13", "classes")
SF = "/root/testdata/sf0.001"
sys.path.insert(0, os.path.join(ROOT, "python"))


def fail(msg):
    print(f"FAIL {msg}")
    sys.exit(1)


def main():
    if not os.path.isdir(CLASSES):
        fail(f"{CLASSES} missing - run `sbt compile` first")
    from pyspark.sql import SparkSession, DataFrame

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pyspark-smoke")
        .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
        .config("spark.driver.extraClassPath", CLASSES)
        .config("spark.executor.extraClassPath", CLASSES)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # 1. the SQL-registered natives, from plain spark.sql
    row = spark.sql(
        "SELECT tokenize('Hello, World! 42') AS t, "
        "float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), "
        "          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d"
    ).head()
    if list(row.t) != ["hello", "world", "42"]:
        fail(f"tokenize: {row.t}")
    if abs(row.d - 11.0) > 1e-12:
        fail(f"float_dot: {row.d}")
    agg = spark.sql(
        "SELECT CAST(sum128(x) AS STRING) AS s FROM VALUES (1L), (2L), (3L) AS t(x)"
    ).head()
    if agg.s != "6":
        fail(f"sum128: {agg.s}")
    print("PASS natives: tokenize / float_dot / sum128 via spark.sql")

    # 2. the Scala driver contract through py4j (the reference's
    #    CaffeOnSpark.py wrapping pattern): flagship entry + a registered
    #    query, results wrapped back into PySpark DataFrames
    jentry = spark._jvm.graft.SparkEntry.entry(spark._jsparkSession)
    entry = DataFrame(jentry, spark)
    n = entry.count()
    if n <= 0:
        fail("SparkEntry.entry returned no rows")
    print(f"PASS SparkEntry.entry via py4j ({n} rows)")

    jfn = spark._jvm.graft.SparkEntry.queries().apply("q2_filter_project")
    q2 = DataFrame(jfn.apply(spark._jsparkSession, SF), spark)
    if q2.count() <= 0 or "l_orderkey" not in [c.lower() for c in q2.columns]:
        fail("registered query q2 returned nothing")
    print(f"PASS registered query q2_filter_project via py4j ({q2.count()} rows)")

    # 3. the packaged module: python/graft.py (Graft + functions helpers)
    import graft as graft_mod
    from graft import Graft
    from graft import functions as gf

    g = Graft(spark)
    names = g.query_names()
    if len(names) < 100 or "q1_pricing_summary" not in names:
        fail(f"Graft.query_names: {len(names)} names")
    q1 = g.query("q1_pricing_summary", SF)
    if q1.count() <= 0:
        fail("Graft.query(q1) returned nothing")
    sql = g.oracle_sql("q1_pricing_summary")
    if "lineitem" not in sql.lower():
        fail(f"Graft.oracle_sql(q1): {sql[:60]!r}")
    if g.entry().count() <= 0:
        fail("Graft.entry returned nothing")
    try:
        g.query("not_a_query", SF)
        fail("Graft.query must raise on an unknown name")
    except Exception:
        pass
    print(f"PASS python module Graft ({len(names)} queries; q1 via module)")

    row2 = (
        spark.createDataFrame([("Hello, World! 42",)], ["text"])
        .select(
            gf.tokenize("text").alias("t"),
            gf.rolling_hash("text").alias("h"),
            gf.char_stats("text").alias("cs"),
            gf.cdc_chunks(gf.tokenize("text"), 1).alias("ch"),
        )
        .head()
    )
    if list(row2.t) != ["hello", "world", "42"] or not isinstance(row2.h, int):
        fail(f"graft.functions: {row2}")
    # char_stats: n = 16 chars of "Hello, World! 42"; divisor 1 cuts at
    # every token, so cdc_chunks == the token list itself
    if row2.cs[0] != 16 or list(row2.ch) != ["hello", "world", "42"]:
        fail(f"graft.functions char_stats/cdc_chunks: {row2.cs} {row2.ch}")
    vec = (
        spark.sql(
            "SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS a, "
            "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b"
        )
        .select(gf.float_dot("a", "b").alias("d"))
        .head()
    )
    if abs(vec.d - 11.0) > 1e-12:
        fail(f"graft.functions.float_dot: {vec.d}")
    g.clear_caches()
    print("PASS python module functions "
          "(tokenize/rolling_hash/char_stats/cdc_chunks/float_dot as Columns)")

    # 4. the config-declared ML lifecycle from Python (the reference
    #    CaffeOnSpark.py core: train/features/test over one declared job) —
    #    same JobConfig document the JobRunner CLI runs
    import json
    import tempfile

    work = tempfile.mkdtemp(prefix="graft-smoke-job")
    (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .selectExpr(
            "vec_id", "embedding",
            "CAST(CASE WHEN embedding[0] + embedding[1] > 0 THEN 1 ELSE 0 END AS INT) AS y",
        )
        .write.mode("overwrite")
        .parquet(f"{work}/train")
    )
    conf = f"{work}/job.json"
    with open(conf, "w") as fh:
        json.dump(
            {
                "source": {"path": f"{work}/train", "labelCol": "y"},
                "dim": 64,
                "lr": 2.0,
                "iters": 10,
                "model": f"{work}/model",
            },
            fh,
        )
    g.train(conf)
    if not os.path.isdir(f"{work}/model"):
        fail("Graft.train did not snapshot the model")
    feats = g.features(conf)
    n_feats = feats.count()
    if feats.columns != ["SampleID", "ip1", "prob"] or n_feats <= 0:
        fail(f"Graft.features: {feats.columns}")
    p = feats.selectExpr("min(prob[0]) AS lo", "max(prob[0]) AS hi").head()
    if not (0.0 <= p.lo <= p.hi <= 1.0):
        fail(f"Graft.features prob out of [0,1]: {p}")
    metrics = g.test(conf)
    if set(metrics) != {"ip1", "prob"} or not (0.0 <= metrics["prob"][0] <= 1.0):
        fail(f"Graft.test: {metrics}")
    print(f"PASS python ML lifecycle train->features->test ({n_feats} feature rows)")

    spark.stop()
    print("PASS pyspark smoke")


if __name__ == "__main__":
    main()
