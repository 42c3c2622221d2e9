package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout utilities (SURVEY §2.9).
  *
  * Y2 `FixedSizePartitioner` (reference FixedSizePartitioner.scala:8-14,
  * applied CaffeOnSpark.scala:363-375): the reference keys rows by
  * zipWithIndex and assigns partition = idx / size so every partition holds
  * exactly `size` rows (training-loop alignment). Spark-native equivalent:
  * a row_number bucket becomes the repartition key — same layout, no custom
  * Partitioner class, works through the DataFrame API.
  *
  * Y1 cluster-aligned repartition and Y3 partition pruning are Catalyst
  * built-ins (`repartition(n)`, scan pruning); Y4 locality pinning is
  * intentionally dropped in favour of broadcast (SURVEY §4).
  */
object Partitioning {

  /** Exact-size partitions: every partition holds `rowsPerPartition` rows
    * (last one ragged), ordered by `orderCols` for determinism.
    *
    * Scale note: the global row_number is a single total order — at 100 TB
    * use it only where the reference's semantics genuinely require equal
    * fill (model-training feed alignment), not for general layout.
    */
  def repartitionFixedSize(df: DataFrame, rowsPerPartition: Int,
      orderCols: Seq[String]): DataFrame = {
    require(rowsPerPartition > 0)
    val w = Window.orderBy(orderCols.map(col): _*)
    val n = df.count()
    val numParts = math.max(1, ((n + rowsPerPartition - 1) / rowsPerPartition).toInt)
    // bucket = partition id directly (hash repartition would collide bucket
    // values and leave ragged/empty partitions — the exact-fill guarantee is
    // the whole point of the operator, so it uses an identity Partitioner
    // like the reference's FixedSizePartitioner).
    val bucketed = df.withColumn("__bucket",
      ((row_number().over(w) - 1) / rowsPerPartition).cast("int"))
    val spark = df.sparkSession
    val width = bucketed.schema.fields.length - 1
    val rdd = bucketed.rdd
      .map(r => (r.getInt(width), org.apache.spark.sql.Row.fromSeq(r.toSeq.take(width))))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = numParts
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataFrame(rdd, df.schema)
  }

  /** A3 partition-size stats (CaffeOnSpark.scala:187-199): per-partition row
    * counts → (min, max, n). Used by the reference to validate feed
    * alignment before training.
    */
  def partitionSizeStats(df: DataFrame): (Long, Long, Int) = {
    val sizes = df.select(spark_partition_id().as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("c"))
      .agg(min("c"), max("c"), count(lit(1)))
      .head()
    (sizes.getLong(0), sizes.getLong(1), sizes.getLong(2).toInt)
  }
}
