ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "muninnavrotoparquetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and several assert PLAN SHAPES inside
// temporary SQL-conf windows (skew forcing, broadcast thresholds, AQE
// advisories). Parallel suites would race those windows — a z-order
// write overlapping the skew test's 32KB advisory partition size
// produces nondeterministic layouts. Serial execution makes every
// plan/layout assertion deterministic.
Test / parallelExecution := false
run / fork := true
// The bench/verify driver parses the LAST ~2000 chars of sbt output for a
// bare JSON line; sbt's default LoggedOutput prefixes forked stdout with
// "[info] ", which breaks json.loads on the line. Pipe the forked JVM's
// stdout straight through instead.
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
  // 16g default: local[32] runs 32 executor threads in THIS one JVM, and
  // an 8g heap (256 MB/thread) showed up in the bench as multi-second GC
  // stop-the-world spikes inflating the MEDIANS of whichever queries they
  // landed on (measured: q_dedup_cc_incr median 8.5 s at 8g vs 1.4 s at
  // 16g on an idle box, same plans — the spread, not the floor, moved).
  // The box has 128 GiB; 16g still leaves >100 GiB of page cache.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
