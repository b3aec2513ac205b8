ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "semantikspark"
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
// Run the test suites in N concurrently-forked JVMs (VERDICT r15 #1c:
// `sbt test` must finish inside the driver's window — the r15 driver
// run expired mid-suite with no failure, which is indistinguishable
// from red). Suites share no cross-JVM state: every suite gets its
// session from SparkSpec.session (one per JVM, local[4], temp dirs via
// createTempDirectory), so N groups × local[4] stays well under the
// 32-core host while cutting the suite wall ~Nx. Round-robin over the
// name-sorted suite list keeps groups balanced and DETERMINISTIC.
val testGroupCount =
  sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "4").toInt
// Longest-processing-time greedy packing over MEASURED suite weights
// (seconds, from a sequential run's log timestamps; unlisted suites
// count 2s). Plain round-robin left one group with the two heaviest
// suites — wall stayed at the sequential 9m; LPT packs the heavy
// suites apart so wall ≈ the heaviest single suite.
val suiteWeightSec: Map[String, Int] = Map(
  "graft.QuerySurfaceSpec" -> 154, "graft.Round14Spec" -> 41,
  "graft.SearchEngineSpec" -> 37, "graft.ParsersProgressSpec" -> 32,
  "graft.DedupScaleSpec" -> 29, "graft.PlanAuditSpec" -> 23,
  "graft.DedupKnnSpec" -> 22, "graft.QuerySyntaxSpec" -> 21,
  "graft.SamplingSpec" -> 21, "graft.LayoutSpec" -> 19,
  "graft.Round13Spec" -> 19, "graft.StreamingStatsSpec" -> 17,
  "graft.SamplingPropertySpec" -> 13, "graft.SketchSpec" -> 7,
  "graft.EdgeCasesSpec" -> 7, "graft.DiversitySpec" -> 6,
  "graft.SqlSurfaceSpec" -> 6, "graft.BpeSpec" -> 6,
  "graft.Round12Spec" -> 6, "graft.DedupRecallPropertySpec" -> 4)
Test / testGrouping := {
  val jopts = (Test / javaOptions).value.toVector
  val byWeight = (Test / definedTests).value
    .sortBy(t => (-suiteWeightSec.getOrElse(t.name, 2), t.name))
  val bins = Array.fill(testGroupCount)(
    (0, scala.collection.mutable.ArrayBuffer.empty[sbt.TestDefinition]))
  byWeight.foreach { t =>
    val i = bins.indices.minBy(bins(_)._1)
    bins(i) = (bins(i)._1 + suiteWeightSec.getOrElse(t.name, 2),
      bins(i)._2 += t)
  }
  bins.toIndexedSeq.zipWithIndex.map { case ((_, ts), g) =>
    Tests.Group(s"group$g", ts.toVector,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(jopts)))
  }
}
// sbt's default restrictions cap forked test groups at 1; lift it to
// the group count (limitAll stays above it so other tasks still run)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(testGroupCount + 2, 8)),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
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
  // The bench executes ~600 generated-codegen query runs in one JVM;
  // the JDK default 240m code cache fills partway through, the JIT
  // stops compiling, and every later execution runs deoptimized —
  // measured as 2-4x inflation of whole queries (r8 head-of-board
  // cluster). 512m keeps the compiler alive for the whole suite.
  "-XX:ReservedCodeCacheSize=512m",
)
