ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daxosspark"
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
// graft.ClusterTest-tagged suites fork real executor JVMs and
// stop/start SparkContexts — they'd kill the shared test session, so
// the default `sbt test` run excludes them. Opt in with:
//   sbt 'set Test / testOptions := Seq()' "testOnly graft.LocalClusterSpec"
// (a -n include cannot override a -l exclude of the same tag, hence
// clearing the option instead)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest,
  "-l", "graft.ClusterTest")
// local-cluster executors in tagged suites need SPARK_HOME, like run/
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13")
// The bench/verify driver invokes `sbt "runMain graft.Bench"` and parses
// the LAST stdout line as JSON. Two pieces of sbt decoration break that:
// (a) the trailing `[success] Total time: …` banner printed AFTER the
// program's own last line, and (b) the `[info] `/`[error] ` prefixes the
// default logged output strategy adds to every forked-process line.
// Suppress the banner and pass the forked process's streams through
// verbatim so the program's final summary line IS the last line sbt emits.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
run / connectInput := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// For graft.LocalClusterSmoke: local-cluster[...] workers assemble the
// executor launch command from SPARK_HOME. Harmless for Bench/Verify
// (local[*] ignores it; /opt/spark/conf holds only templates).
run / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  // the executor-command launcher probes source-tree build dirs to
  // infer the scala version unless told; /opt/spark is a binary dist
  "SPARK_SCALA_VERSION" -> "2.13")
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
