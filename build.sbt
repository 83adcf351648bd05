ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "st_bigdata_consume_batch_ma_with_cr_ecdspark"
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
// Forked-run output goes straight to this process's stdout, UNdecorated —
// sbt's default logger prefixes every line with [info]/[error], which breaks
// machine parsing of Bench's JSON result line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and no "[success] Total time" banner AFTER it, so the JSON line stays
// the LAST line on stdout (bench_out.json is the file-based fallback).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 8g measured FASTER than 40g for the fuzzy-dedup suite on this host
  // (d6 warm: 16.8 s at -Xmx8g vs ~170 s at -Xmx40g, reproduced twice at
  // local[32]) — a huge G1 heap lets cached/checkpointed blocks pile up
  // on-heap and GC scans dominate; a small heap spills them to fast local
  // disk instead. Keep 8g unless SPARK_DRIVER_MEM overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
