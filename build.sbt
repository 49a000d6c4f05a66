ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataengazurespotifyspark"
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
  // Pin the heap: the bench protocol runs two explicit full GCs per
  // query block (equal-footing sweep + post-untimed-run collection),
  // and G1 SHRINKS/uncommits the committed heap on a full GC when Xms
  // is far below Xmx — so every block's TIMED runs were re-committing
  // pages the previous sweep gave back, a broad fixed tax that lands
  // hardest on sub-second rows (round-18's ~1.3-1.5x small-row
  // inflation, VERDICT r18 What's-wrong 2). Equal Xms keeps the
  // committed heap constant across all 283 sweeps; the GCs still
  // collect, they just stop resizing.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The full bench suite compiles ~124 queries x 5 runs of codegen'd
  // plans; the JVM default ReservedCodeCacheSize (240 MB) fills, the JIT
  // compiler shuts off, and the LAST queries in the run execute
  // interpreted (round-9: the final six queries ran 3-23x their isolated
  // medians — 53.5s of a 118.7s total was this artifact). 1 GB keeps the
  // whole suite compiled. SegmentedCodeCache gives the sweeper separate
  // profiled/non-profiled regions so long runs degrade gracefully.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+SegmentedCodeCache",
)
