ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kalyticalspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as bare JSON; sbt's default LoggedOutput decorates every forked line
// with an "[info] " prefix, which broke that parse three rounds running
// (BENCH_r{08,09,10}.json all "parsed": null). StdoutOutput hands the
// forked JVM the real stdout/stderr, so the summary line arrives bare —
// and showSuccess := false drops sbt's own "[success] Total time" stdout
// epilogue that would otherwise land AFTER it as the new last line.
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
// Heap sizing (r13): the bench JVM IS the whole local[32] "cluster" —
// executor storage memory comes out of this one heap. At 8g the r12
// registry (190 queries, multiple memoized vector/media planes)
// crossed the storage threshold and LRU eviction recomputed the
// vector-topk and DAG families' cached inputs mid-bench: the exact
// concentrated 2-5x "regressions" in BENCH_r12.json (isolated runs of
// the same rows read at r11 speed). The box has 128 GiB; 48g keeps the
// full memo working set resident with ample margin for sbt + page cache.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
