ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cozospark"
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
// The bench driver captures only the last ~3 KB of stdout and parses the
// final JSON line; sbt's "[success] Total time ..." epilogue would eat
// ~75 bytes of that window right after the line that matters.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked run output must reach stdout verbatim: the default output
// strategy routes it through sbt's logger, which prefixes every line
// with "[info] " — a JSON line that starts with "[info] {" fails a
// strict last-line json parse. StdoutOutput also keeps the fork's
// stderr (Spark WARN chatter) on stderr instead of logging it as
// "[error]" lines into stdout after the JSON line.
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] with 8g forces constant GC once the bench suite grew
  // broadcast-heavy queries (round-4 bench: uniform ~2-4x inflation
  // from heap pressure, not plans). The box has 128 GiB; give the
  // single-JVM "cluster" a realistic executor-memory share.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
