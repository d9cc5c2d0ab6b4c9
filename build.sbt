ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rds_to_datalakeprojectspark"
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
// Report per-test durations (-oD): the r16 driver record shows the suite
// budget-killed with no failing assertion — attribution needs numbers.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Run the suite as PARALLEL forked JVM groups (r17, VERDICT r16 #2a): one
// sequential forked JVM took the whole suite past the driver's test
// budget (the streaming suites alone carry minutes of micro-batch trigger
// waits). Suites were already session-isolated per JVM (graft.TestSpark is
// a per-JVM lazy singleton with its own temp warehouse/metastore), so
// giving each group its own JVM changes nothing about what any suite
// observes. Round-robin over sorted names splits the alphabetically-
// adjacent streaming suites across groups; 6 groups × local[4] sessions
// fit a 32-core host with room to spare.
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val n = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withOutputStrategy((Test / outputStrategy).value)
  // Longest-processing-time-first bin packing over measured sequential
  // suite seconds (2026-08-19 run; unlisted suites ~10 s), so no group
  // carries two of the slow streaming suites while another runs only
  // sub-second kernels.
  val weight = Map(
    "PlanLintSpec" -> 300, "StreamingPagerankWarmSpec" -> 171,
    "StreamingLineDedupSpec" -> 120, "StreamingNearDupSpec" -> 105,
    "IncrementalDedupSpec" -> 78, "StreamingCurateSpec" -> 67,
    "StreamingSpanDedupSpec" -> 53, "CurateStreamingSpec" -> 52,
    "QueryEngineSpec" -> 46, "PipelineSpec" -> 46,
    "StreamingPagerankSpec" -> 45, "SigRegistrySpec" -> 41,
    "PageRankSpec" -> 40, "ExtremaStateSpec" -> 38,
    "LakeCatalogSpec" -> 33, "CdcStreamIngestSpec" -> 31,
    "StreamingSemDedupSpec" -> 28, "GroupingSetReaggSpec" -> 26,
    "DedupScaleSpec" -> 19, "SketchStateSpec" -> 16,
    "KeyedLakeTableSpec" -> 16)
  def w(t: TestDefinition): Int = weight.getOrElse(t.name.split('.').last, 10)
  val bins = Array.fill(n)(Vector.empty[TestDefinition])
  val loads = Array.fill(n)(0)
  tests.sortBy(t => -w(t)).foreach { t =>
    val i = loads.zipWithIndex.minBy(_._1)._2
    bins(i) = bins(i) :+ t
    loads(i) += w(t)
  }
  bins.zipWithIndex.map { case (ts, i) =>
    Tests.Group(s"g$i", ts, Tests.SubProcess(forkOpts))
  }.toSeq
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "6").toInt))
// Forked run output goes straight to our stdout/stderr — no sbt [info]/[error]
// prefixes, so harness mains (Bench/Verify) can print machine-parseable lines.
run / outputStrategy := Some(StdoutOutput)
Test / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
