ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskobjspark"
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
// pass forked stdout through RAW (no sbt `[info]` prefix): the driver
// machine-parses Bench's single JSON line from the process output
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
  // the machine has ~125 GiB; 8g left ~2.8 GB of Spark storage memory,
  // and the r4 registry's cached frames (shared dedup/signature/pair
  // frames + per-query caches across 127 queries) evicted each other —
  // the uniform ~2x warm regression of the dedup family in BENCH_r04.
  // 48g keeps every shared frame resident at sf0.1 with headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++
  // dev knob: extra JVM flags for forked runs (GC experiments, -Xlog:gc)
  sys.env.get("SPARK_GRAFT_JVM_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty))
    .getOrElse(Seq.empty)
