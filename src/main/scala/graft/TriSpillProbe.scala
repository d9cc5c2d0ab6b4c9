package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** TEMP probe (not part of the engine): run the m_triangles_x1000 wedge
  * computation over the materialized 120M-edge fixture and report, per
  * completed stage, task count, total task time, shuffle read/write and
  * SPILL bytes — the §5 attribution VERDICT r16 #1 asked for. Knobs come
  * from the session env (SPARK_GRAFT_CPUS, SPARK_GRAFT_INITIAL_PARTITIONS,
  * SPARK_DRIVER_MEM via the sbt fork), so one invocation = one config
  * point; results are compared across invocations on the same day.
  */
object TriSpillProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val fixture = sys.env.getOrElse("SPARK_GRAFT_TRI_FIXTURE",
      "/tmp/graft_sbfix_r16a_630760762929_tri_edges_x1000_/t")

    case class St(name: String, tasks: Int, timeMs: Long,
        srBytes: Long, swBytes: Long, memSpill: Long, diskSpill: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.add(St(s"stage${i.stageId}(${i.numTasks}t)", i.numTasks,
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.diskBytesSpilled))
      }
    })

    val e = spark.read.parquet(fixture)
    val t0 = System.nanoTime()
    graft.graph.Triangles.perNode(e)
      .write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[trispill] total $dt%.2f s  (initialPartitions=" +
      sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "default") +
      s" cpus=${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}" +
      s" mem=${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")})")
    def gb(b: Long): String = f"${b / 1e9}%.1fGB"
    import scala.jdk.CollectionConverters._
    val sorted = stages.asScala.toSeq.sortBy(-_.timeMs)
    sorted.take(12).foreach { s =>
      println(f"[trispill] ${s.name}%-16s time=${s.timeMs / 1000.0}%8.1fs " +
        f"sr=${gb(s.srBytes)}%8s sw=${gb(s.swBytes)}%8s " +
        f"spillMem=${gb(s.memSpill)}%8s spillDisk=${gb(s.diskSpill)}%8s")
    }
    val totSpill = sorted.map(_.diskSpill).sum
    val totSr = sorted.map(_.srBytes).sum
    println(f"[trispill] TOTAL diskSpill=${gb(totSpill)} shuffleRead=${gb(totSr)}")
    spark.stop()
  }
}
