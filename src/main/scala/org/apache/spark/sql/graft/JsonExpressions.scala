package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native integer JSON-field extraction: `json_long_field(s, 'k')` ==
  * `CAST(get_json_object(s, '$.k') AS LONG)` for top-level integer fields
  * of a JSON object (property-tested in JsonFieldSpec), evaluated as ONE
  * byte-level scan ([[ExprKernels.jsonLongField]]).
  *
  * Why not the built-in: `GetJsonObject` is a `CodegenFallback` — it drops
  * the WHOLE enclosing projection out of whole-stage codegen and runs a
  * Jackson streaming parse per row (path compilation, token events, string
  * materialization), ~50× the cost of the scan for flat metadata props like
  * `{"k": 21}` (q25 measured). This expression stays inside the stage and
  * allocates nothing but the boxed result.
  *
  * Scope (documented, property-enforced): top-level field of an object,
  * numeric values — integers parse over the FULL long range (negated
  * accumulation, so Long.MinValue parses exactly as the built-in CAST
  * does), floats truncate toward zero (the legacy-cast rule); strings,
  * bools, nulls, nested values, exponent forms and values outside
  * [Long.MinValue, Long.MaxValue] are null, all matching the
  * get_json_object+CAST verdicts on those shapes. Nested and
  * string-valued paths stay on the built-in.
  */
case class JsonLongField(child: Expression, key: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_long_field"

  @transient private lazy val keyU = UTF8String.fromString(key)

  override def nullSafeEval(input: Any): Any =
    ExprKernels.jsonLongField(input.asInstanceOf[UTF8String], keyU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("key", keyU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("jlf")
      s"""
         |java.lang.Long $tmp = org.apache.spark.sql.graft.ExprKernels.jsonLongField($c, $keyRef);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonExpressions {
  def json_long_field(c: Column, key: String): Column =
    ExpressionUtils.column(JsonLongField(ExpressionUtils.expression(c), key))
}
