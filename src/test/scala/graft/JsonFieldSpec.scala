package graft

import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, GetJsonObject, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ExprKernels, JsonExpressions}
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** JsonLongField vs the built-in `CAST(get_json_object(s,'$.key') AS LONG)`:
  * generated flat-and-nested JSON objects with the target key absent,
  * present with integer / float / string / bool / null / nested values, at
  * varying positions, whitespace and adjacent sabotage keys. The two must
  * agree on every well-formed object — that is the substitution q25 relies
  * on.
  */
class JsonFieldSpec extends SparkSpec {

  private def builtin(json: String, key: String): Option[Long] = {
    val e = Cast(
      GetJsonObject(Literal(UTF8String.fromString(json)), Literal(UTF8String.fromString(s"$$.$key"))),
      LongType, None, EvalMode.LEGACY)
    Option(e.eval(null)).map(_.asInstanceOf[Long])
  }

  private def native(json: String, key: String): Option[Long] =
    Option(ExprKernels.jsonLongField(UTF8String.fromString(json), UTF8String.fromString(key)))
      .map(_.longValue())

  test("agrees with get_json_object+CAST on generated well-formed objects") {
    val keyGen = Gen.oneOf("k", "key", "kk", "value2")
    val scalarGen: Gen[String] = Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.chooseNum(-1e6, 1e6).map(_.toString),                   // float → truncate
      Gen.alphaNumStr.map(s => "\"" + s + "\""),                  // string → null
      Gen.oneOf("true", "false", "null"),                         // → null
      Gen.const("{\"inner\": 7, \"s\": \"a{b}\\\"c\"}"),          // nested obj → null
      Gen.const("[1, {\"x\": 2}, \"s]s\"]"))                      // array → null
    val wsGen = Gen.oneOf("", " ", "  ", "\n\t")
    val pairGen: Gen[String] = for {
      k <- Gen.oneOf("k", "key", "kk", "other", "ké\\\"y")
      v <- scalarGen
      w1 <- wsGen; w2 <- wsGen
    } yield s""""$k"$w1:$w2$v"""
    val objGen: Gen[(String, String)] = for {
      key <- keyGen
      pairs <- Gen.listOfN(4, pairGen)
      w <- wsGen
    } yield (s"{$w${pairs.mkString(", ")}$w}", key)

    val seed = new scala.util.Random(20260812)
    val params = Gen.Parameters.default
    var checked = 0
    (1 to 3000).foreach { i =>
      objGen(params, org.scalacheck.rng.Seed(seed.nextLong())).foreach { case (json, key) =>
        // duplicate keys: both engines take the FIRST occurrence? Jackson's
        // path evaluator returns the first match too — but guard the
        // generator anyway: only compare when the key appears at most once
        val occurrences = s""""$key"""".r.findAllIn(json).length
        if (occurrences <= 1) {
          assert(native(json, key) == builtin(json, key),
            s"divergence on $json key=$key: native=${native(json, key)} builtin=${builtin(json, key)}")
          checked += 1
        }
      }
    }
    assert(checked > 2000, s"generator starved: only $checked cases compared")
  }

  test("edge shapes: absent key, empty object, non-object, overflow, whitespace") {
    val cases = Seq(
      ("""{}""", "k") -> None,
      ("""{"a": 1}""", "k") -> None,
      ("""{"k": 21}""", "k") -> Some(21L),
      ("""{ "k" : -42 }""", "k") -> Some(-42L),
      ("""{"k": 1.5}""", "k") -> Some(1L), // legacy cast truncates toward zero
      ("""{"k": -1.5}""", "k") -> Some(-1L),
      ("""{"k": 1.0E3}""", "k") -> None, // exponent: null, like the legacy cast
      ("""{"k": "12"}""", "k") -> None, // string-typed: stays on the built-in
      ("""{"k": null}""", "k") -> None,
      ("""{"kk": 1, "k": 2}""", "k") -> Some(2L),
      ("""{"a": {"k": 9}, "k": 3}""", "k") -> Some(3L), // top-level only
      ("""{"k": 9223372036854775807}""", "k") -> Some(Long.MaxValue),
      ("""{"k": -9223372036854775808}""", "k") -> Some(Long.MinValue),
      ("""{"k": -9223372036854775809}""", "k") -> None, // negative overflow
      ("""{"k": 9223372036854775808}""", "k") -> None, // overflow
      ("""[1, 2]""", "k") -> None,
      ("""not json""", "k") -> None,
      ("""{"k": 21""", "k") -> Some(21L)) // truncated after value: scan got there
    cases.foreach { case ((json, key), want) =>
      assert(native(json, key) == want, s"$json → ${native(json, key)}, want $want")
    }
  }

  test("duplicate keys: native takes the first occurrence, like the built-in") {
    val cases = Seq(
      """{"k": 1, "k": 2}""",
      """{"k": 7, "a": 0, "k": 9}""",
      """{"a": 1, "k": 3, "k": null}""")
    cases.foreach { json =>
      assert(native(json, "k") == builtin(json, "k"),
        s"$json: native=${native(json, "k")} builtin=${builtin(json, "k")}")
    }
  }

  test("codegen and interpreted paths agree through a real plan + SQL registry") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("""{"k": 21}""", """{"j": 1}""", """{"k": -3, "j": 1}""", null)
      .toDF("props")
    val viaColumn = df.select(JsonExpressions.json_long_field(col("props"), "k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(viaColumn == Seq(Some(21L), None, Some(-3L), None))
    val viaSql = spark.sql("""SELECT json_long_field('{"k": 7}', 'k')""").head.getLong(0)
    assert(viaSql == 7L)
  }
}
