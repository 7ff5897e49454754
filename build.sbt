ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopgpuspark"
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
// Pass the forked JVM's stdout/stderr through verbatim: the bench/verify
// drivers parse a bare JSON line from stdout, and sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks that parse.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// The bench driver keeps only the LAST ~2000 chars of stdout; sbt's
// "[success] Total time: ..." trailer (~76 chars) printed AFTER the bench
// JSON line clipped the line's head every round <= 6. Suppress it so the
// JSON line graft.Bench prints is the absolute last stdout.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another setting;
// keep the lint quiet about it (and about the bare run/outputStrategy twin).
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
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
  // 24g default: the bench session runs 40+ queries in one long-lived JVM
  // on a 128 GiB box; at 8g the later queries GC-thrash (observed 3-6x
  // slowdowns and executor-heartbeat RPC timeouts under local[32]).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
