ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphviewspark"
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
// The driver parses the bench's ONE-LINE contract JSON from stdout.
// sbt's default forked-output strategy logs every line through its
// logger ("[info] {...}") and appends "[success] Total time: ..."
// after the program exits — which is why every BENCH_r10..r15 artifact
// carries parsed:null (r15 verdict #1). Pass forked stdout/stderr
// through verbatim and drop the [success] trailer so the JSON summary
// is the literal last line of stdout:
//   sbt -batch "runMain graft.Bench" | tail -1 | python3 -m json.tool
outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Commit and pre-fault the whole heap at JVM start: without this the
  // kernel zeroes pages on first touch DURING the run, and the first
  // allocation-heavy query after the graph build eats that sys time in
  // its measured window (r14: q_bigram_logprob alone carried sys_pct
  // 62 in-bench at sf1 while standalone fresh-JVM runs were clean —
  // the heap-growth zeroing landed in exactly its window). Start-up
  // cost is untimed; measurement windows stay zeroing-free.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
// The heap pre-commit only benefits MEASURED runs (Bench/tools via
// runMain, which must stay flag-free for the driver's recipe): a Test
// fork that hard-commits and pre-faults the full -Xmx at startup pays
// multi-second pre-touch latency per fork and can refuse to start on a
// memory-constrained host — Test forks keep the default lazy-commit
// heap policy (r15 review item).
Test / javaOptions := (Test / javaOptions).value
  .filterNot(o => o == "-XX:+AlwaysPreTouch" || o.startsWith("-Xms"))
