ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyconnectspark"
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
// DRIVER BENCH-PARSE CONTRACT (round-18, verdict r17 item 1 — eight
// consecutive rounds of PERF_*.json parsed:null): the driver captures
// the stdout TAIL of `sbt -batch "runMain graft.Bench"` and
// json-parses the LAST line. Two sbt behaviors broke that on every
// round so far:
//   1. forked run output defaults to LoggedOutput, which prefixes
//      every app line with "[info] " — StdoutOutput inherits the raw
//      streams instead (app stdout -> sbt stdout, app stderr -> sbt
//      stderr, no prefix);
//   2. sbt prints "[success] Total time: …" AFTER the app exits, so
//      the last stdout line was never the app's JSON — showSuccess
//      := false suppresses it.
// tools/check_bench_tail.py emulates the driver's tail capture and is
// the local gate for this contract.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  // 28g default: the 60-query single-JVM bench loop degrades badly under
  // heap pressure (round 1 recorded 171 s for a ~7 s query at 8g); the
  // sandbox has 128 GiB, so a generous heap keeps in-loop ≈ isolated.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // 110 codegen'd queries in one JVM generate far more compiled classes
  // than the 240 MB default code cache holds; once it fills, the JIT
  // stops compiling and compute-bound late-suite queries (q57's
  // levenshtein stage) run interpreted at 5-10x cost. Headroom keeps
  // in-suite ≈ isolated.
  "-XX:ReservedCodeCacheSize=1g",
)
