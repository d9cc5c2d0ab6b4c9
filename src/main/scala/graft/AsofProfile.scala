package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage decomposition for the as-of join — the one analytic family the
  * r12 full-surface sweep left with a persistent work-scale gap vs
  * DuckDB's native ASOF operator (q107 4.6×, q126/q127 ~6.9× at ×10).
  * Components:
  *
  *   floor        — union + key repartition + per-partition sort + side
  *                  filter, NO carry: what any ordered one-pass as-of
  *                  must pay.
  *   window       — the current operator ([[graft.operators.AsofJoin
  *                  .asof]]): floor + WindowExec running `last(…,
  *                  ignoreNulls)` (buffers every key partition).
  *   mapcarry     — floor + a Dataset-level mapPartitions carry (one
  *                  streaming pass, no partition buffering — but pays
  *                  the external-Row SerDe boundary).
  *
  * window − floor = what partition-buffering window machinery costs;
  * mapcarry vs window = whether a streaming carry wins even AFTER the
  * SerDe tax (a custom SparkPlan would keep the streaming pass without
  * the tax). */
object AsofProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the q127 uniform shape — the SAME stable materialized fixture the
    // bench's m_asof entries and the DuckDB ASOF twin read
    // (SPARK_GRAFT_ASOF_TIMES picks the replication decade)
    val times = sys.env.getOrElse("SPARK_GRAFT_ASOF_TIMES", "10").toInt
    def facts = spark.read.parquet(
      graft.bench.ScaleBench.asofFixturePath(spark, sfDir, "facts", times))
    def dims = spark.read.parquet(
      graft.bench.ScaleBench.asofFixturePath(spark, sfDir, "dims", times))
    val payloadCols = Seq("state_id", "state_value")

    def tagged: DataFrame = {
      val factStruct = struct(facts.columns.map(col): _*)
      val payloadStruct = struct(payloadCols.map(col): _*)
      val payloadType = dims.select(payloadStruct).schema.head.dataType
      val factType = facts.select(factStruct).schema.head.dataType
      dims.select(col("user_id").as("__k"), col("ts_us").as("__ts"),
          lit(0).as("__side"), payloadStruct.as("__p"),
          lit(null).cast(factType).as("__f"))
        .union(facts.select(col("user_id").as("__k"), col("ts_us").as("__ts"),
          lit(1).as("__side"), lit(null).cast(payloadType).as("__p"),
          factStruct.as("__f")))
    }

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[asofprof] $tag%-12s min ${ts.min}%.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    time("scan") { // union'd scans + tag projection, no exchange
      noop(tagged)
    }
    time("floor") {
      noop(tagged.repartition(col("__k"))
        .sortWithinPartitions(col("__k"), col("__ts"), col("__side"))
        .where(col("__side") === 1))
    }
    time("window") {
      noop(graft.operators.AsofJoin.asofWindow(facts, dims, "user_id",
        "ts_us", payloadCols))
    }
    time("carry") { // the AsofCarryExec streaming operator (current asof)
      noop(graft.operators.AsofJoin.asof(facts, dims, "user_id", "ts_us",
        payloadCols))
    }
    time("merge_raw") { // AsofMergeExec on UNSORTED inputs: per-side
      // exchange + sort of the narrow originals instead of one sort of
      // the widened tagged union
      noop(graft.operators.AsofJoin.asofMerge(facts, dims, "user_id",
        "ts_us", payloadCols))
    }
    time("window_buf1m") {
      // same plan, WindowExec's per-group buffer kept as an in-memory
      // row array instead of transitioning to the spillable unsafe store
      // at 4096 rows (the fixture's key groups run ~26k rows)
      spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold",
        "1048576")
      try noop(graft.operators.AsofJoin.asof(facts, dims, "user_id",
        "ts_us", payloadCols))
      finally spark.conf.set(
        "spark.sql.windowExec.buffer.in.memory.threshold", "4096")
    }
    time("mapcarry") {
      val t = tagged.repartition(col("__k"))
        .sortWithinPartitions(col("__k"), col("__ts"), col("__side"))
      val outSchema = StructType(
        facts.schema.fields ++
          dims.select(payloadCols.map(col): _*).schema.fields
            .map(_.copy(nullable = true)))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val nPayload = payloadCols.length
      val out = t.mapPartitions { it =>
        var curKey: Any = null
        var haveKey = false
        var state: Row = null
        it.flatMap { r =>
          val k = r.get(0)
          if (!haveKey || !java.util.Objects.equals(k, curKey)) {
            curKey = k; haveKey = true; state = null
          }
          if (r.getInt(2) == 0) { // dim: update carried payload
            state = r.getStruct(3); Iterator.empty
          } else {
            val f = r.getStruct(4)
            Iterator.single(Row.fromSeq(
              f.toSeq ++ (if (state == null) Seq.fill(nPayload)(null)
                          else state.toSeq)))
          }
        }
      }(enc)
      noop(out)
    }
    spark.stop()
  }
}
