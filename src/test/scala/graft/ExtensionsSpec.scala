package graft

import org.apache.spark.sql.graft.{GraftExtensions, GraftFunctions}

/** Native expressions exposed as SQL functions: runtime registration on a
  * live session, plus the SparkSessionExtensions hook for
  * `spark.sql.extensions` (bindable only at session construction, so here
  * it is exercised structurally).
  */
class ExtensionsSpec extends SparkSpec {

  test("float_dot / float_norm callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "float_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("float_dot agrees with the interpreted path and handles nulls") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d").head()
    assert(r.isNullAt(0))
  }

  test("GraftExtensions injects both functions at construction time") {
    // structural: the injector runs without error on a fresh extensions bag
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
