package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway perf probe (not part of the driver contract). */
object Scratch {
  def time(label: String, runs: Int)(f: => DataFrame): Unit = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SCRATCH $label%-28s median=${ts.sorted.apply(runs / 2)}%8.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = graft.Tables(spark, dir, "lineitem")
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast(LongType)
    val filt = col("l_shipdate") <= lit("2000-12-01 00:00:00").cast(TimestampType)

    // warmup
    graft.queries.Relational.q1PricingSummary.fn(spark, dir)
      .write.format("noop").mode("overwrite").save()

    time("scan+filter+count", 5)(li.filter(filt).groupBy().count())
    time("scan all cols", 5)(li.filter(filt))
    time("agg count only", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus").count())
    time("agg 5 long sums", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity"))),
          sum(cents(col("l_extendedprice"))),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))),
          sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))),
          sum(cents(col("l_discount"))), count(lit(1))))
    time("agg 5 dec38 sums", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity")).cast(DecimalType(38, 0))),
          sum(cents(col("l_extendedprice")).cast(DecimalType(38, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).cast(DecimalType(38, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))).cast(DecimalType(38, 0))),
          sum(cents(col("l_discount")).cast(DecimalType(38, 0))), count(lit(1))))
    time("agg 5 dec20 sums", 5)(
      li.filter(filt).groupBy("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_quantity")).cast(DecimalType(20, 0))),
          sum(cents(col("l_extendedprice")).cast(DecimalType(20, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).cast(DecimalType(20, 0))),
          sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax")))).cast(DecimalType(20, 0))),
          sum(cents(col("l_discount")).cast(DecimalType(20, 0))), count(lit(1))))
    time("q1 full current", 5)(graft.queries.Relational.q1PricingSummary.fn(spark, dir))
    time("q12 full current", 5)(graft.queries.Relational.q12Rollup.fn(spark, dir))

    // q10 variants: expand-based multi-distinct vs separate aggs crossJoined
    time("q10 expand form", 5)(
      li.agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows")))
    time("q10 crossjoin form", 5) {
      val p = li.agg(countDistinct(col("l_partkey")).as("n_parts"))
      val s2 = li.agg(countDistinct(col("l_suppkey")).as("n_supps"))
      val o = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val n = li.agg(count(lit(1)).as("n_rows"))
      p.crossJoin(s2).crossJoin(o).crossJoin(n)
    }

    // q38 variants: percentile aggregate vs groupBy-count + window cumsum
    time("q38 percentile form", 5)(
      li.groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_partkey, 0.5)").as("median_part"),
          expr("percentile(l_suppkey, 0.5)").as("median_supp"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"))
    time("q38 cumsum form", 5) {
      import org.apache.spark.sql.expressions.Window
      def med(vcol: String, out: String) = {
        val cnt = li.groupBy(col("l_returnflag"), col(vcol).as("v"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("l_returnflag").orderBy("v")
        val cum = cnt
          .withColumn("cum", sum(col("c")).over(w))
          .withColumn("n", sum(col("c")).over(Window.partitionBy("l_returnflag")))
        cum.groupBy(col("l_returnflag"), col("n"))
          .agg(
            (max(when(col("cum") - col("c") <= (col("n") - 1) / 2 &&
              (col("n") - 1) / 2 < col("cum"), col("v"))) +
              (max(when(col("cum") - col("c") <= col("n") / 2 &&
                col("n") / 2 < col("cum"), col("v"))) -
                max(when(col("cum") - col("c") <= (col("n") - 1) / 2 &&
                  (col("n") - 1) / 2 < col("cum"), col("v")))) * 0.5).as(out))
          .select(col("l_returnflag"), col(out))
      }
      med("l_partkey", "median_part")
        .join(med("l_suppkey", "median_supp"), "l_returnflag")
        .join(li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")), "l_returnflag")
        .orderBy("l_returnflag")
    }

    // q23: lag/cumsum windows vs built-in session_window aggregation
    time("q23 current", 5)(graft.queries.EventOps.q23Sessionize.fn(spark, dir))
    time("q23 session_window", 5) {
      val ev = graft.Tables(spark, dir, "events")
      import org.apache.spark.sql.expressions.Window
      val sess = ev
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("sv"))
      sess
        .withColumn("session_idx",
          row_number().over(Window.partitionBy("user_id").orderBy(col("sw.start"))).cast("long"))
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("session_start"), col("session_end"), (col("sv") / 100.0).as("sum_value"))
        .orderBy("user_id", "session_idx")
    }

    // q38: percentile over raw rows vs pre-counted (v, freq) pairs
    time("q38 freq form", 5) {
      val cnt = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_partkey, 0.5)").as("x")) // warm guard
      cnt
    }
    time("q38 freq real", 5) {
      val byPart = li.groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("cp"))
      val bySupp = li.groupBy(col("l_returnflag"), col("l_suppkey"))
        .agg(count(lit(1)).as("cs"))
      val p = byPart.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_partkey, 0.5, cp)").as("median_part"),
          sum(col("cp")).as("n"))
      val sup = bySupp.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_suppkey, 0.5, cs)").as("median_supp"))
      p.join(sup, "l_returnflag")
        .select(col("l_returnflag"), col("median_part"), col("median_supp"), col("n"))
        .orderBy("l_returnflag")
    }

    // centroid aggregation: where does KMeans.centroids spend time?
    {
      val emb = graft.Tables(spark, dir, "embeddings")
      time("cent explode only", 5)(
        emb.select(col("label").as("c_label"), posexplode(col("embedding")).as(Seq("idx", "v")))
          .groupBy(col("c_label"), col("idx")).agg(count(lit(1)).as("c")))
      time("cent double sum", 5)(
        emb.select(col("label").as("c_label"), posexplode(col("embedding")).as(Seq("idx", "v")))
          .groupBy(col("c_label"), col("idx"))
          .agg((sum(col("v").cast(DoubleType)) / count(lit(1))).as("m")))
      time("cent decimal sum", 5)(
        emb.select(col("label").as("c_label"), posexplode(col("embedding")).as(Seq("idx", "v")))
          .groupBy(col("c_label"), col("idx"))
          .agg((sum(col("v").cast(DoubleType).cast(DecimalType(18, 9)))
            .cast(DecimalType(38, 9)).cast(DoubleType) / count(lit(1))).as("m")))
      time("cent full (collect_list)", 5)(
        graft.ml.KMeans.centroids(emb.withColumn("__k", col("label")), "__k"))
    }

    // q42 decomposition
    {
      import graft.ml.KMeans
      val emb = graft.Tables(spark, dir, "embeddings")
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"SCRATCH42 $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f"); r
      }
      (1 to 3).foreach { _ =>
        val c0 = timed("c0 collect")(KMeans.collectCentroids(KMeans.centroids(
          emb.withColumn("__k", col("label")), "__k")))
        val a0 = KMeans.assignWith(emb, c0)
        val c1 = timed("c1 collect")(KMeans.collectCentroids(KMeans.centroids(a0, "cell")))
        val a1 = KMeans.assignWith(emb, c1)
        val q = a1.filter(col("vec_id") === 0)
        val probeSet = KMeans.probeCellsWith(q, c1, nprobe = 2)
          .join(q.select(col("vec_id"), col("embedding").as("qv")), "vec_id")
          .select(col("cell").as("pcell"), col("qv"))
        timed("final job") {
          a1.filter(col("vec_id") =!= 0)
            .join(broadcast(probeSet), col("cell") === col("pcell"))
            .select(col("vec_id"), col("label"), col("cell"),
              org.apache.spark.sql.graft.VectorExpressions
                .float_dot(col("embedding"), col("qv")).as("dot"))
            .orderBy(col("dot").desc, col("vec_id"))
            .limit(10)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
