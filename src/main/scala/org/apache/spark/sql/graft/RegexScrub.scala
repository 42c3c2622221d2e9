package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused multi-pattern scrub: returns
  * `struct(scrubbed: STRING, n_hits: INT)` where `scrubbed` is the input
  * run through the patterns' `regexp_replace` passes IN ORDER and
  * `n_hits` is the sum of `regexp_count(original, pattern_i)` — counts on
  * the ORIGINAL string, like the compose form it replaces (a later
  * pattern may match text an earlier replacement rewrote; the count
  * metric deliberately reflects the raw input).
  *
  * Identical BY ALGORITHM to the q55 compose form (three RegExpReplace +
  * three RegExpCount expressions, property-tested): the same
  * java.util.regex patterns, the same sequential passes, the same
  * Matcher.appendReplacement semantics (replacements may use $-group
  * references exactly as regexp_replace does). The fusion is the win: the
  * compose form crossed UTF8String↔String six times per row and walked
  * the string six expression evaluations apart; this walks the same
  * passes over ONE materialized String inside one codegen call.
  */
case class RegexScrub(child: Expression, patterns: Seq[String], replacements: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty && patterns.size == replacements.size,
    s"${patterns.size} patterns vs ${replacements.size} replacements")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_hits", IntegerType, nullable = false)))
  override def prettyName: String = "regex_scrub"

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    patterns.map(java.util.regex.Pattern.compile).toArray
  @transient private lazy val repls: Array[String] = replacements.toArray

  override def nullSafeEval(input: Any): Any =
    RegexScrub.scrub(input.asInstanceOf[UTF8String], compiled, repls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("patterns", compiled, "java.util.regex.Pattern[]")
    val rRef = ctx.addReferenceObj("repls", repls, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RegexScrub$$.MODULE$$.scrub($c, $pRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexScrub {
  /** One String materialization, patterns.length count passes on the
    * original + patterns.length replace passes applied sequentially.
    */
  def scrub(input: UTF8String, patterns: Array[java.util.regex.Pattern],
      repls: Array[String]): InternalRow = {
    val original = input.toString
    var hits = 0
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(original)
      while (m.find()) hits += 1
      i += 1
    }
    var s = original
    i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      if (m.find()) {
        val sb = new java.lang.StringBuffer()
        do m.appendReplacement(sb, repls(i)) while (m.find())
        m.appendTail(sb)
        s = sb.toString
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(s), hits)
  }

  def regex_scrub(c: Column, rules: Seq[(String, String)]): Column =
    ExpressionUtils.column(RegexScrub(ExpressionUtils.expression(c),
      rules.map(_._1), rules.map(_._2)))
}
