ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "waldenspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The Spark Connect CLIENT lives in a subdirectory the (non-recursive)
// unmanagedBase skips — test classpath only, for the full gRPC
// round-trip spec (ServeSpec). Its class overlap with the server jar
// is the identical generated proto code; harmless. Same absolute-path
// dependency class as unmanagedBase above: this build targets the
// pinned image (ServeSpec's connect test references the client class
// at compile time, so the jar must exist wherever tests compile).
Test / unmanagedJars +=
  Attributed.blank(file("/opt/spark/jars/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"))
Test / fork := true
run / fork := true
// Driver bench-parse contract (r14 verdict #1): the forked run's output
// must reach stdout UNDECORATED. The default LoggedOutput strategy
// re-logs every forked line as "[info] ..." — which made the bench's
// one-line JSON unparseable to the driver's tail harvester two rounds
// running ("parsed": null in BENCH_r13/r14). StdoutOutput inherits the
// process's stdout/stderr directly: the bare "{...}" line is the last
// thing on stdout. showSuccess=false drops the "[success] Total time"
// trailer that would otherwise follow it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
