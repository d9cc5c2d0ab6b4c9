package graft.orchestrate

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{BatchPlan, TableTodo, Tracker}
import graft.sources.CdcFileSource

/** The CDC orchestration loop — plan, persist the plan, execute, advance
  * (`rds_to_datalake/incremental_load_orchestration.py:315-414`).
  *
  * Semantics preserved from the reference:
  *  - single-flight: at most one batch in execution (`cdk_define.py:316-318`
  *    `max_concurrent_runs=1`; a second concurrent call is refused);
  *  - bounded batches: ≤ `maxFiles` files per table per run, within
  *    `maxIntervalSeconds` of the checkpoint;
  *  - the plan is serialized to a sequence-numbered JSON file BEFORE
  *    execution — the batch's query plan is inspectable/replayable state;
  *  - checkpoint advance is atomic per run.
  *
  * Deliberate divergence (SURVEY.md §2.8 "failure semantics gap"): the
  * reference advances its checkpoint even when the job run FAILED
  * (`:390-403`), silently dropping batches. Here the checkpoint advances
  * ONLY when every table's batch executed successfully; a failed run leaves
  * the tracker untouched and the next run replays the same plan — safe
  * because the keyed merge is idempotent.
  */
final class CdcOrchestrator(
    spark: SparkSession,
    cdcRoot: String,
    planDir: String,
    trackerPath: String,
    tables: Seq[String],
    maxFiles: Int = 2,
    maxIntervalSeconds: Long = 30 * 60,
    execute: (String, DataFrame) => Unit) {

  private val inFlight = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Seed a table's checkpoint at bootstrap time (the reference initializes
    * the tracker from the initial load's snapshot time — without this, a
    * bounded `maxInterval` window starting at epoch would never reach the
    * first CDC file). No-op if the table already has a checkpoint. */
  def seed(table: String, at: java.time.LocalDateTime): Unit = {
    val state = Tracker.load(trackerPath)
    if (!state.tables.exists(_.table == table))
      Tracker.save(trackerPath, state.advanced(table, at.format(Tracker.fmt)))
  }

  /** Plan and execute one batch. Returns true if the checkpoint advanced —
    * either files were processed or an idle window was crossed — and false
    * when fully caught up. Throws (without advancing) on failure. */
  def runOnce(): Boolean = {
    if (!inFlight.compareAndSet(false, true))
      throw new IllegalStateException(
        "a batch is already in flight (single-flight orchestrator)")
    try {
      val state = Tracker.load(trackerPath)
      val todos = tables.flatMap { t =>
        val after = state.forTable(t).lastAsDateTime
        val todo = CdcFileSource.listTodo(
          spark.sparkContext.hadoopConfiguration,
          s"$cdcRoot/$t", after, maxFiles, maxIntervalSeconds)
        todo.endUntil.map { end =>
          TableTodo(t, state.forTable(t).lastProcessedTime,
            end.format(Tracker.fmt), todo.files)
        }
      }
      if (todos.isEmpty) return false

      val seq = state.seq + 1
      val plan = BatchPlan(seq, todos)
      Files.createDirectories(Paths.get(planDir))
      Files.writeString(Paths.get(planDir, plan.filename), BatchPlan.toJson(plan))

      // Execute every table's batch; any failure aborts the run before the
      // checkpoint moves. An empty-file todo is a pure checkpoint advance
      // over an idle window — nothing to execute.
      todos.filter(_.files.nonEmpty).foreach { todo =>
        execute(todo.table, spark.read.parquet(todo.files: _*))
      }

      val advanced = todos.foldLeft(state.copy(seq = seq)) { (st, todo) =>
        st.advanced(todo.table, todo.endUntil)
      }
      Tracker.save(trackerPath, advanced)
      true
    } finally inFlight.set(false)
  }

  /** Drain the backlog: run batches until caught up. Returns the number of
    * batches executed (the in-process analog of the reference's 60-second
    * cron loop, `s3_orchestrate_incremental_glue_job.py:6-9`). */
  def runUntilCaughtUp(maxRuns: Int = 10000): Int = {
    var n = 0
    while (n < maxRuns && runOnce()) n += 1
    n
  }

  /** Most recent persisted plan, if any (newest-first listing works by the
    * seq filename construction). */
  def latestPlan(): Option[BatchPlan] = {
    val dir = Paths.get(planDir)
    if (!Files.exists(dir)) None
    else {
      import scala.jdk.CollectionConverters._
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".json"))
        .toSeq.sorted.headOption
        .map(f => BatchPlan.fromJson(Files.readString(dir.resolve(f))))
      finally stream.close()
    }
  }
}
