ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "duckdbmppspark"
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
// The multi-JVM tier (graft.ClusterSpec) spawns real executor JVMs via
// local-cluster and cannot share a JVM with the local[4] suites —
// excluded from plain `sbt test`, run via `sbt "testOnly graft.ClusterSpec"`
// (which clears the exclusion automatically for an explicitly named suite?
// no — scalatest still filters by tag, so use the documented invocation:
// `sbt "set Test/testOptions := Seq()" "testOnly graft.ClusterSpec"` or
// `SPARK_HOME=/opt/spark sbt "runMain graft.tools.ClusterCheck"`).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest,
  "-l", "graft.ClusterTag")
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
  // Modest default so `sbt test` on ordinary dev/CI hosts never swaps
  // or gets OOM-killed (round-5 ADVICE). The scaled sf3/sf10 bench
  // phases need a big heap (localCheckpoint blocks — dedup shingle
  // relations — evict at 16g and steady-state rows measure
  // recomputation): export SPARK_DRIVER_MEM=48g for those runs, as
  // BASELINE.md §4 documents.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
