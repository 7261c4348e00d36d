ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandastopostgresspark"
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
// The bench/driver contract needs the summary JSON as the process's LAST
// bare stdout line. sbt's default LoggedOutput prefixes every forked-run
// line with "[info] " and appends a "[success] Total time..." footer, so
// the r14 driver could not parse ANY bench output (PERF_r14
// prev/now_bench_ok false). StdoutOutput inherits the forked JVM's stdout
// verbatim; showSuccess/showTiming silence the footer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Pre-size the heap: growing from the tiny default -Xms during the
  // first heavy query was measured as a 12s-vs-3s first-run swing on
  // allocation-heavy operators (setsim's array_intersect verify).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM_MIN", "8g")}",
  // 142 bench queries x 3 passes of whole-stage-codegen classes overflow
  // the default 240m JIT code cache; once full the compiler shuts off and
  // queries run partially interpreted — the measured bimodal 3x per-query
  // swings across bench passes. At 223 queries the 1g cache showed the
  // same signature again (decode-heavy mapPartitions ops doubling,
  // +0.1-0.5s diffuse drift on everything else) — 2g holds the full
  // suite's compiled classes with headroom.
  "-XX:ReservedCodeCacheSize=2048m",
)
