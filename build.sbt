ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatainvesttinkspark"
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
// The driver json-parses the LAST stdout line of `sbt -batch "runMain …"`.
// Two sbt behaviors have broken that parse every round so far:
//  - sbt prefixes forked-process output with "[info] " under the default
//    LoggedOutput strategy → StdoutOutput passes program stdout through raw;
//  - sbt appends its own "[success] Total time: …" line AFTER the program's
//    final line → showSuccess := false suppresses it.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
outputStrategy := Some(StdoutOutput)
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
  // 24g default: a full bench run keeps every query's cached relations and
  // shuffle buffers in one JVM; at 8g the alphabetically-late queries ran
  // inside GC churn (observed: an 1s aggregate timed at 11s mid-bench).
  // The sandbox has 128 GiB; a real cluster sizes executor memory likewise.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Catalyst codegen emits one Janino class per plan fragment; a full bench
  // run over every query overflows the default 240m JIT code cache, after
  // which HotSpot stops compiling and later queries run interpreted
  // (observed: 3s queries ballooning to 50s late in the run).
  "-XX:ReservedCodeCacheSize=1g",
)
