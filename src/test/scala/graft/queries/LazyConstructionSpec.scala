package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Query constructors must be PURE plan builders: no Spark job may run at
  * construction time (the round-7 `parallel` helper called
  * `df.rdd.getNumPartitions`, forcing eager physical-plan materialization
  * per query build — this pins the metadata-only replacement). */
class LazyConstructionSpec extends AnyFunSuite with SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("constructing a pipeline query launches no Spark job") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // First touch of a table may run one driver-side schema/listing job
    // (spark.read.parquet); Tables.load memoizes it, so construction is
    // jobless from the second touch on — warm the memo, then count.
    graft.Tables.load(spark, sf, "documents")
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = PipelineQueries.q40ExactDedup(spark, sf)
      // force full logical planning too — still must not run a job
      df.queryExecution.optimizedPlan
      // job-start events are delivered async; give the bus a beat
      Thread.sleep(500)
      assert(jobs.get() == 0,
        s"query construction launched ${jobs.get()} Spark job(s)")
      // and the parallelism decision still fires: the sf0.001 documents
      // table is one tiny file, so the scan gets spread to the default
      // parallelism via a Repartition node
      assert(df.queryExecution.optimizedPlan.toString.contains("Repartition"),
        "tiny single-file scan should still be repartitioned")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
