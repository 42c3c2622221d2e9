ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "caffeonsparkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked process's stdout through UNWRAPPED (no sbt "[info] "
// prefix): the driver parses Bench's JSON line from stdout, and the
// logger-decorated form is unparseable ("parsed": null in BENCH_r1..r3).
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g made the 32-thread suite GC-bound: full-suite total dropped
  // 24.3s -> 22.4s at sf0.1 just from the larger heap (measured round 6)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The 58-query suite JIT-compiles hundreds of whole-stage-codegen
  // classes; the JDK default 240 MB code cache silently flushes warm
  // methods under that load, and the flushed victims rove — measured
  // 10×+ slowdowns on random queries per pass (q19 6.3s vs 0.44s for
  // the same plan). 1 GB holds the whole suite compiled.
  "-XX:ReservedCodeCacheSize=1g",
)
