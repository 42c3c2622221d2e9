package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT float_dot(a, b)")`
  * and `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * work on an unmodified Spark distribution (the customization-ladder rung
  * SURVEY §2.11 maps the reference's input-adapter registry onto).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("float_norm"),
      new ExpressionInfo(classOf[FloatVectorNorm].getName, "float_norm"),
      (children: Seq[Expression]) => FloatVectorNorm(children.head)))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Runtime registration for sessions that already exist (extensions bind
  * only at session construction — e.g. notebooks, tests).
  */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_dot",
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1)), "built-in")
    reg.createOrReplaceTempFunction("float_norm",
      (children: Seq[Expression]) => FloatVectorNorm(children.head), "built-in")
  }
}
