package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** TEMP probe (not part of the engine): interleaved A/B/C of the shuffle-
  * sizing configs over the m_triangles_x1000 fixture, ONE JVM (the only
  * honest wall-clock form on a host with a 2× intra-hour band — all the
  * knobs under test are runtime-settable SQL confs):
  *
  *   A — r16 engine: initialPartitionNum=cores, advisory=64m
  *   B — r17 engine: initialPartitionNum=8×cores, advisory=16m
  *   C — B + AQE maxShuffledHashJoinLocalMapThreshold=64m (runtime
  *       SMJ→SHJ conversion: stream the wedge set, hash the edges)
  *
  * Per pass: wall seconds + total task time + disk/memory spill.
  */
object TriAbProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val fixture = sys.env.getOrElse("SPARK_GRAFT_TRI_FIXTURE",
      "/tmp/graft_sbfix_r16a_630760762929_tri_edges_x1000_/t")

    val taskTime = new AtomicLong(0)
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        taskTime.addAndGet(m.executorRunTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    })

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    def arm(name: String): Unit = name match {
      case "A" =>
        conf("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          cpus.toString)
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        conf("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      case "B" =>
        conf("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          (cpus * 8).toString)
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        conf("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      case "C" =>
        arm("B")
        conf("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
    }

    val e = spark.read.parquet(fixture)
    for (pass <- 1 to 3; a <- Seq("A", "B", "C")) {
      arm(a)
      taskTime.set(0); memSpill.set(0); diskSpill.set(0)
      spark.sparkContext.setJobDescription(s"tri x1000 arm $a pass $pass")
      val t0 = System.nanoTime()
      graft.graph.Triangles.perNode(e)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[triab] pass$pass arm $a wall=$dt%7.1fs " +
        f"taskTime=${taskTime.get() / 1000.0}%8.1fs " +
        f"memSpill=${memSpill.get() / 1e9}%6.1fGB " +
        f"diskSpill=${diskSpill.get() / 1e9}%6.1fGB")
    }
    spark.stop()
  }
}
