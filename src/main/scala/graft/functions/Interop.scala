package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small interop/projection helpers from the reference's UDF surface. */
object Interop {

  /** P5 (CaffeOnSpark.scala:96-98): first element of a float-array column as
    * a double label — as a native expression, not a UDF.
    */
  def labelFromArray(c: Column): Column = element_at(c, 1).cast("double")

  /** P6 (CaffeOnSpark.scala:99-103): float-array feature column → MLlib
    * dense vector, via the built-in codegen'd converter.
    */
  def toMlVector(c: Column): Column =
    org.apache.spark.ml.functions.array_to_vector(c)

  /** P2 (ImageDataFrame.scala:48-62, DataFrameSource.scala:91-98): declared
    * schema with optional columns — add any missing column with its default,
    * validate the required ones exist.
    */
  def withDefaults(df: DataFrame, required: Seq[String],
      defaults: Map[String, Column]): DataFrame = {
    val present = df.columns.toSet
    val missingReq = required.filterNot(present)
    require(missingReq.isEmpty, s"missing required columns: ${missingReq.mkString(", ")}")
    defaults.foldLeft(df) { case (d, (name, default)) =>
      if (present(name)) d else d.withColumn(name, default)
    }
  }

  /** P10 scale transform (FloatDataTransformer scale param,
    * lrcn_cos.prototxt:33-39): elementwise multiply of a float-array column.
    */
  def scaleTensor(c: Column, s: Double): Column =
    transform(c, x => (x.cast("double") * s).cast("float"))
}
