ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ftsanalysisdatalakespark"
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
// forked `run` output passes through RAW instead of via sbt's logger
// (which "[info] "-prefixes every line): the bench harness contract is a
// machine-parseable one-line JSON on stdout, and the prefix kept every
// round's record from parsing (BENCH_r01–r17 "parsed": null). sbt's own
// "[success]" trailer still follows — Bench also persists the summary to
// BENCH_SUMMARY.json for consumers that take only the last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 90+ queries x whole-stage codegen generates hundreds of classes; the
  // default 240m code cache flushes under that load and later queries fall
  // back to interpreted bytecode (measured 3-6x slowdowns late in Bench;
  // the r1 driver bench still degraded in its tail at 512m with 32 threads,
  // so reserve 1g — the cache is virtual-reserved, not committed up front).
  "-XX:ReservedCodeCacheSize=1g",
)
