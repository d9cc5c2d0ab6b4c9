package graft

import org.apache.spark.sql.SparkSession

/** The engine's session defaults in ONE place — every CLI main
  * (Verify/Bench/profiles) and any embedding application builds through
  * here so a measured knob is an ENGINE property, not a bench-session
  * accident (r13 verdict #7). Each default carries its measurement:
  *
  *  - `parquet.columnarReaderBatchSize = 16384` (default 4096): −15% on
  *    the 60M-row materialized-scan floor (MatScanProfile 2026-08-15,
  *    0.60 → 0.51 s; whole query −12%) for ~0.5 MB more per open column
  *    batch — the dominant residual of m_q87_mat's JVM decode constant.
  *  - `legacy.bucketedTableScan.outputOrdering = true`: lets a
  *    one-file-per-bucket (key, ts)-sorted table — exactly what
  *    [[graft.sql.QueryEngine.saveBucketed]] writes — expose its sort to
  *    the planner, so [[graft.operators.AsofJoin.asof]]'s detected merge
  *    and q94-style co-located joins plan with zero sorts. Spark guards
  *    the multi-file case itself (ordering is only claimed when each
  *    bucket holds one file), so the conf is safe engine-wide.
  *  - `shuffle.partitions = cores`: local[n] has exactly n slots; the
  *    200 default just multiplies scheduling overhead. A cluster
  *    deployment overrides per its executor count (or leaves AQE
  *    coalescing to fix it).
  *  - AQE stays ON (Spark's default): coalescing and skew-join handling
  *    matter more at real scale than its per-query planning cost at
  *    bench scale.
  *  - UTC session timezone and `legacy.parquet.nanosAsLong` pin the
  *    driver corpus's timestamp vintages to one reading.
  */
object GraftSession {

  /** Apply the engine defaults to an existing builder (cluster
    * deployments: set master/executors yourself, then pipe through
    * here). */
  def configure(b: SparkSession.Builder, cpus: Int): SparkSession.Builder =
    b.withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // Data-sized shuffle partitions via AQE (guide §2.1/§5): exchanges
      // START at 8× the core count and AQE's coalescing folds small
      // shuffles back down (parallelismFirst keeps ~cores partitions on
      // the sub-second queries), so only shuffles that genuinely carry
      // hundreds of MB keep many partitions — the scale-adaptive form of
      // "partitions sized to data, not to the machine". Motivation (r17,
      // VERDICT r16 #1): the 120M-edge wedge sort and the 65M-edge
      // PageRank exchanges ran in `cores` partitions, so per-task sort
      // state exceeded its execution-memory share and the decade entries
      // serialized through spill — same speed at 8 and 32 cores. At 8×
      // the per-task state drops under the spill threshold and the
      // stages scale with cores again (numbers in OPTIMIZATION_r17.md).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
          (cpus * 8).toString))
      // AQE coalescing targets COMPRESSED shuffle bytes; at the default
      // 64m advisory a post-shuffle sort partition decompresses to
      // ~0.5–1 GB of rows — far past a task's execution-memory share on
      // any sanely-packed executor — and the decade-scale sorts spill
      // (TriSpillProbe: 48–66 GB memory spill per ×1000 pass). 16m keeps
      // the post-shuffle task state inside execution memory; small
      // shuffles are unaffected (parallelismFirst already targets
      // bytes/parallelism, well under 16m there).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "16m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("SPARK_GRAFT_READER_BATCH", "16384"))
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

  /** A local[cpus] session with the engine defaults — the CLI mains'
    * entry point. */
  def local(cpus: Int): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
