ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cloudtraceexporterspark"
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
// Driver bench contract (r20 verdict task 1 — 8 rounds of "parsed": null):
// the driver greps the LAST stdout line of `sbt "runMain graft.Bench"` for
// the summary JSON. Two sbt behaviors broke that: (1) the default
// LoggedOutput strategy routes the forked app's stdout through sbt's
// logger, prefixing every line with "[info] "; (2) sbt prints
// "[success] Total time: ..." AFTER the app's last line. StdoutOutput
// passes the forked app's stdout/stderr straight through unprefixed, and
// showSuccess := false drops the trailing [success] line — so the app's
// final println IS the last stdout line and parses as raw JSON.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// the bare-scoped key is picked up via delegation by run/runMain's
// forkOptions; sbt's lint can't see that — exclude it from the check
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
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
)
