package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.LakeOps

/** Specification of a keyed, partitioned, upsertable lake table — the three
  * degrees of freedom of the reference's lake tables (SURVEY.md §1.1 item 4;
  * `glue_jobs/initial_load.py:156-183`, `glue_jobs/incremental.py:216-243`):
  * record key, precombine key (latest-wins), and the timestamp column the
  * 5-level partition path derives from.
  *
  * @param path            table root directory
  * @param recordKeys      unique record key (possibly composite)
  * @param precombine      conflict-resolution column: greatest value wins
  * @param partitionSource ISO-8601 string column the partition columns are
  *                        derived from; the reference's invariant is that it
  *                        NEVER changes across versions of one key
  *                        (`README.rst:124`), so a key lives in exactly one
  *                        partition — the merge exploits and asserts this
  * @param tieBreak        columns ordering rows with *equal* precombine
  *                        values descending, to make merges deterministic
  *                        (ADVICE r1: same-timestamp CDC updates are common)
  * @param softDeleteCol   opt-in TOMBSTONE column (boolean): a row with the
  *                        flag true is a delete of its key, riding the merge
  *                        as an ordinary latest-wins version — it must WIN by
  *                        precombine to take effect, and a later live version
  *                        resurrects the key, so replay/merge semantics are
  *                        unchanged and an out-of-order older version can
  *                        never resurrect a deleted key. The table keeps
  *                        tombstone rows ([[KeyedLakeTable.read]] returns
  *                        them; [[KeyedLakeTable.readLive]] filters them);
  *                        physical removal is a later compaction/retention
  *                        pass. The change feed classifies tombstone winners
  *                        as `delete`, and [[graft.ops.IncrementalAgg
  *                        .retractions]] counts only LIVE images, so
  *                        incremental aggregates track the live table. The
  *                        reference scopes deletes out entirely
  *                        (`README.rst:53`, stream REMOVE skipped) — None
  *                        (the default) preserves exactly that behavior.
  */
final case class LakeTableSpec(
    path: String,
    recordKeys: Seq[String] = Seq("id"),
    precombine: String = "update_at",
    partitionSource: String = "create_at",
    tieBreak: Seq[String] = Nil,
    softDeleteCol: Option[String] = None)

/** Keyed upsert-merge lake table — a pure-Spark, Hudi-COPY_ON_WRITE-
  * equivalent sink with no external table-format dependency.
  *
  * Write path (reference semantics, Spark-first plan):
  *
  *  1. incoming batch → derive the 5 partition columns (narrow projection),
  *     drop the CDC `Op` marker, window-dedup within the batch
  *     (`incremental.py:172-183`);
  *  2. `upsert` prunes the existing table read to ONLY the partitions the
  *     batch touches (partition values are collected from the deduped batch —
  *     bounded by batch size, never table size), unions existing + incoming
  *     with a source-priority column, and resolves per key with latest-wins
  *     where ties go to the incoming row (Hudi precombine behavior,
  *     `incremental.py:225-226`);
  *  3. the merged rows are written back with dynamic partition overwrite, so
  *     only touched partitions are rewritten — the 100 TB cost of a batch is
  *     O(touched partitions), not O(table).
  *
  * The one shuffle is the dedup window on the record key; its input is
  * (touched partitions + batch), which the never-changing `partitionSource`
  * invariant keeps proportional to batch size.
  */
object KeyedLakeTable {
  /** Cross-instance memo of resolved reads, keyed by (Spark application,
    * table path, mergeSchema) and guarded by the table's COMMIT VERSION
    * (r17, VERDICT r16 #5): `spark.read.parquet(dir)` pays a recursive
    * O(partition-dirs) driver-side listing on EVERY call, and one
    * incremental-view fold reads its two state tables ~5 times per cycle
    * — re-listing a table nothing has written to. Every graft write bumps
    * a `_graft_commit` marker (one tiny underscore-prefixed file, invisible
    * to scans exactly like `_SUCCESS`); a read re-uses the memoized
    * resolved frame only while the marker value is UNCHANGED, so any
    * graft writer — this instance, another instance, another JoinView
    * over the same paths — invalidates it. The multi-writer contract is
    * preserved for every writer that goes through this class (the only
    * supported kind — see JoinView's single-maintainer posture); a table
    * without a marker (pre-r17 layout, foreign writer) never memoizes and
    * keeps the old list-every-time behavior. */
  private val readMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Boolean), (String, DataFrame)]
}

final class KeyedLakeTable(spark: SparkSession, val spec: LakeTableSpec) {
  import spec._

  private val partCols = LakeOps.partitionCols

  private def hadoopFs = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def commitMarker = new org.apache.hadoop.fs.Path(path, "_graft_commit")

  /** Called after every successful write: new marker value = reads must
    * re-list. (A crash between data write and bump leaves the OLD value in
    * place and the next read of this session re-lists only if it never
    * memoized — the stale-memo window is closed by the bump happening
    * before the writing call returns.) */
  private def bumpCommit(): Unit = {
    val out = hadoopFs.create(commitMarker, true)
    try out.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
    finally out.close()
  }

  private def markerVersion(): Option[String] =
    try {
      val f = hadoopFs
      if (!f.exists(commitMarker)) None
      else {
        val in = f.open(commitMarker)
        try Some(new String(in.readAllBytes(), "UTF-8"))
        finally in.close()
      }
    } catch { case _: java.io.IOException => None }

  /** The table's base read, memoized per (app, path, mergeSchema) while
    * the commit marker is unchanged — two cheap FS calls instead of an
    * O(dirs) recursive listing on a warm hit. */
  private def rawRead(mergeSchema: Boolean): DataFrame = {
    def build(): DataFrame =
      if (mergeSchema) spark.read.option("mergeSchema", "true").parquet(path)
      else spark.read.parquet(path)
    markerVersion() match {
      case None => build()
      case Some(v) =>
        val key = (spark.sparkContext.applicationId, path, mergeSchema)
        val hit = KeyedLakeTable.readMemo.get(key)
        if (hit != null && hit._1 == v) hit._2
        else {
          val df = build()
          KeyedLakeTable.readMemo.put(key, (v, df))
          df
        }
    }
  }

  /** Batch prep shared by both write modes: reject null partition sources
    * (a null would otherwise silently shunt rows into the Hive default
    * partition and break the pruned merge), drop Op, derive partitions,
    * in-batch latest-wins dedup (W1 before the sink, like the reference). */
  private def prep(df: DataFrame): DataFrame = {
    softDeleteCol.foreach { f =>
      require(df.columns.contains(f),
        s"KeyedLakeTable($path): softDeleteCol '$f' missing from batch — " +
          "every batch of a soft-delete table must carry the tombstone flag")
      require(df.schema(f).dataType ==
          org.apache.spark.sql.types.BooleanType,
        s"KeyedLakeTable($path): softDeleteCol '$f' must be boolean, got " +
          df.schema(f).dataType.sql)
    }
    val guarded0 = df.withColumn(partitionSource,
      coalesce(col(partitionSource), raise_error(lit(
        s"KeyedLakeTable($path): null $partitionSource in batch — the " +
          "partition source column is mandatory (db_orm.py audit-column contract)"))))
    // a null tombstone flag means "live" — normalize so the merged table
    // and the change feed never carry a three-valued delete flag
    val guarded = softDeleteCol.fold(guarded0)(f =>
      guarded0.withColumn(f, coalesce(col(f), lit(false))))
    val withParts = LakeOps.derivePartitionColumns(LakeOps.dropOp(guarded), partitionSource)
    LakeOps.latestWinsDedup(withParts, recordKeys, precombine,
      tieBreak.map(c => col(c).desc))
  }

  /** Cluster rows by their target partition before the partitioned write:
    * without this every one of the N shuffle partitions drops a file into
    * every partition directory (N× small-file amplification, measured on
    * the bench). One shuffle, one file per partition. At sizes where one
    * file per partition is too coarse, add a within-partition salt here to
    * bound file size — the write pattern stays the same. */
  private def clustered(df: DataFrame): DataFrame =
    df.repartition(partCols.map(col): _*)

  /** K1 — bootstrap: full overwrite of the table from a snapshot
    * (`initial_load.py:156-183`). */
  def overwrite(df: DataFrame): Unit = {
    clustered(prep(df)).write
      .mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)
    bumpCommit()
  }

  /** K2/J1/U1 — incremental keyed merge: update-if-exists-else-insert with
    * latest-wins precombine, ties resolved for the incoming row
    * (`incremental.py:216-243`).
    *
    * `evolveSchema = false` (default) requires the batch to carry exactly
    * the table's columns — a renamed source column fails loudly instead of
    * silently forking the schema. `evolveSchema = true` merges schemas the
    * way a long-lived CDC table must when the source database gains or
    * drops columns: batch-only columns join the table (existing rows read
    * them as null), table-only columns null-fill the batch, and a SAME-NAME
    * column whose type changed is always an error — silent coercion would
    * corrupt every already-written row at its next merge. After an evolving
    * write, untouched partitions still hold old-schema files, so [[read]]
    * footer-merges schemas across files. */
  def upsert(df: DataFrame, evolveSchema: Boolean = false): Unit = {
    // The batch feeds three actions (guard, touched-partition collect, the
    // merge write). Persist it so the batch SOURCE — possibly a remote
    // decompress-heavy read — is scanned once, not once per action; batches
    // are bounded, so the cache is batch-sized by the same argument as the
    // checkpoint below.
    val batch = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try { upsertPersisted(batch, evolveSchema, withChanges = false); () }
    finally batch.unpersist(false)
  }

  /** [[upsert]] that also RETURNS the merge's change feed: one row per
    * batch key with `change_type` ∈ insert | update | noop, the replaced
    * row as `old_image` (null on insert) and the batch's winning version
    * as `new_image`. `noop` = the table already held a version at or past
    * the batch's (a replayed or late batch) — the write changed nothing
    * for that key.
    *
    * The feed is what downstream INCREMENTAL consumers need: an exact
    * retraction stream (−old, +new) that maintains aggregates without
    * rescanning the table ([[graft.ops.IncrementalAgg]]). Cost: one extra
    * key-join of the batch against the SAME pruned touched-partition read
    * the merge itself does — O(batch), never O(table) — and the returned
    * frame is eagerly materialized (batch-bounded) so it stays valid after
    * the overwrite rewrites the partitions it was computed from.
    *
    * Images carry the columns the table and batch SHARE (under
    * `evolveSchema` a batch-only column is absent from `old_image`, a
    * dropped one from `new_image`). */
  def upsertChanges(df: DataFrame, evolveSchema: Boolean = false): DataFrame = {
    val batch = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try upsertPersisted(batch, evolveSchema, withChanges = true).get
    finally batch.unpersist(false)
  }

  /** MERGE-ON-READ write (the Hudi MOR / Delta deletion-vector trade,
    * adapted to a latest-wins table): APPEND the batch's winning rows
    * into their partition dirs without reading or rewriting anything —
    * the whole copy-on-write merge cost (touched-partition read,
    * key-join, partition rewrite) is deferred to readers. Correct
    * because latest-wins is idempotent and associative: deduping
    * base ∪ appended versions at READ time ([[readMerged]]) yields
    * exactly the state the eager merge would have written, and
    * [[compactMerged]] folds the accumulated versions back into
    * one-winner-per-key files when read amplification outweighs the
    * write savings. Write cost: O(batch) — one guard aggregate and one
    * append, no table read at all.
    *
    * Contract differences from [[upsert]], enforced loudly:
    *  - `(precombine, tieBreak)` must totally order a key's versions —
    *    appended files carry no arrival order, so the eager merge's
    *    incoming-wins tie rule does not exist here; a configured
    *    `tieBreak` (the reference's event-id role) is REQUIRED;
    *  - no schema evolution (append files must match the table), and no
    *    change feed (computing old images would read the table, which is
    *    the cost this mode exists to avoid — use [[upsertChanges]], or
    *    derive feeds at compaction, where incremental consumers need
    *    them). */
  def upsertDeferred(df: DataFrame): Unit = {
    require(tieBreak.nonEmpty,
      s"KeyedLakeTable($path): deferred (merge-on-read) upserts need a " +
        "tieBreak — appended files have no arrival order, so equal " +
        "precombine values would pick a nondeterministic winner")
    val batch = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val guard = batch
        .groupBy(recordKeys.map(col): _*)
        .agg(countDistinct(col(partitionSource)).as("__n"))
        .agg(count(lit(1)).as("__keys"),
          coalesce(max(col("__n")), lit(0L)).as("__maxn"))
        .head()
      if (guard.getLong(0) == 0L) return // empty batch: legitimate no-op
      require(guard.getLong(1) <= 1L,
        s"KeyedLakeTable($path): a record key has multiple " +
          s"$partitionSource values in one batch — the partition source " +
          "must be immutable per key")
      if (!exists) { overwrite(batch); return }
      // one sampled footer, NOT a mergeSchema pass — deferred mode forbids
      // evolution, so every file carries the same columns and the
      // distributed footer-merge would cost more than the append itself —
      // and memoized per handle: even the sampled read pays an O(dirs)
      // partition-discovery listing (measured ~1 s on a 720-dir table)
      if (deferredExpected == null)
        deferredExpected = spark.read.parquet(path).columns.toSet
      val expected = deferredExpected
      val incomingCols = prep(batch).columns.toSet
      require(incomingCols == expected,
        s"KeyedLakeTable($path): deferred append schema mismatch — batch " +
          s"yields ${incomingCols.toSeq.sorted.mkString(",")} vs table " +
          s"${expected.toSeq.sorted.mkString(",")} (no evolution in " +
          "merge-on-read mode)")
      clustered(prep(batch)).write
        .mode(SaveMode.Append)
        .partitionBy(partCols: _*)
        .parquet(path)
      bumpCommit()
    } finally batch.unpersist(false)
  }

  @volatile private var deferredExpected: Set[String] = null

  /** The merged state of a table written (fully or partly) through
    * [[upsertDeferred]]: [[read]] plus one latest-wins dedup over the
    * accumulated versions — the read-side half of merge-on-read. On a
    * fully-compacted (or eagerly-merged) table the dedup finds one
    * version per key and passes rows through unchanged, so this is
    * always safe to use; it costs one keyed shuffle over the rows read
    * (partition-pruned reads prune the dedup's input identically). */
  def readMerged(): DataFrame =
    LakeOps.latestWinsDedup(read(), recordKeys, precombine,
      tieBreak.map(c => col(c).desc))

  /** [[readMerged]] minus tombstones — the MOR analog of [[readLive]]. */
  def readLiveMerged(): DataFrame = {
    val f = softDeleteCol.getOrElse(throw new IllegalStateException(
      s"KeyedLakeTable($path): readLiveMerged needs spec.softDeleteCol"))
    readMerged().filter(!coalesce(col(f), lit(false)))
  }

  /** Fold accumulated deferred versions back to one winner per key — the
    * pay-once compaction that restores eager-merge read costs. Staged
    * through a sibling temp dir (never reads and overwrites the same
    * files in one job), table-sized but disk-bound, no driver state. */
  def compactMerged(): Unit = {
    val stage = path + s".compact-${java.util.UUID.randomUUID.toString.take(8)}"
    readMerged().write.parquet(stage)
    overwrite(spark.read.parquet(stage))
    val p = new org.apache.hadoop.fs.Path(stage)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Changelog of merging `incoming` (one row per key) into `existing`
    * (one row per key; empty on bootstrap). Mirrors the merge's win rule
    * exactly: strictly-newer (precombine, tieBreak) wins, and an exact tie
    * ALSO goes to the incoming row — the merge's ordering ends with
    * `__src desc` in both tieBreak configurations, so the incoming row
    * replaces the table row on a full ordering tie (classifying it `noop`
    * would let downstream [[graft.ops.IncrementalAgg]] state drift from
    * the table when tied versions carry different payloads). Only a
    * strictly-older batch version is a noop. */
  private def changelog(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val shared = incoming.columns.filter(existing.columns.contains)
      .filterNot(recordKeys.contains)
    val ordCols = precombine +: tieBreak
    def image(d: DataFrame, cols: Seq[String]) =
      d.select(recordKeys.map(col) :+
        struct(cols.map(col): _*).as("__img"): _*)
    val newImgCols = incoming.columns.filterNot(recordKeys.contains)
    val oldSide = image(existing, shared)
      .withColumnRenamed("__img", "old_image")
    val newSide = image(incoming, newImgCols.toSeq)
      .withColumnRenamed("__img", "new_image")
    def ord(img: Column) = struct(ordCols.map(c => img.getField(c)): _*)
    val newer = ord(col("new_image")) > ord(col("old_image"))
    val tied = ord(col("new_image")) === ord(col("old_image"))
    val wins = col("old_image").isNull || newer || tied
    // With soft deletes the non-noop cases refine by the LIVE transition:
    // a tombstone winner is a `delete` (whatever it replaced — aggregates
    // only retract a live old image), a live winner over a tombstone (or
    // nothing) is an `insert` (resurrection adds, retracts nothing), and
    // live-over-live stays `update`.
    val changeType = softDeleteCol match {
      case None =>
        when(col("old_image").isNull, lit("insert"))
          .when(newer || tied, lit("update"))
          .otherwise(lit("noop"))
      case Some(f) =>
        def dead(img: Column) = coalesce(img.getField(f), lit(false))
        when(!wins, lit("noop"))
          .when(dead(col("new_image")), lit("delete"))
          .when(col("old_image").isNull || dead(col("old_image")),
            lit("insert"))
          .otherwise(lit("update"))
    }
    newSide.join(oldSide, recordKeys.toSeq, "left")
      .withColumn("change_type", changeType)
      .select(recordKeys.map(col) :+ col("change_type") :+
        col("old_image") :+ col("new_image"): _*)
  }

  private def upsertPersisted(df: DataFrame, evolveSchema: Boolean,
      withChanges: Boolean): Option[DataFrame] = {
    // ONE guard pass over the batch (was two driver jobs in r2):
    //  - an empty batch is a legitimate no-op (CDC extractors emit empty
    //    files) and must not reach the write paths — an "overwrite" of
    //    nothing would leave a part-less directory whose later reads fail
    //    schema inference, a permanently poisoned table path;
    //  - the pruned merge is only correct if a key's partitionSource never
    //    changes (`README.rst:124`). Enforce the half that is checkable at
    //    batch cost — two versions of one key with different partition
    //    values in the SAME batch — including for the bootstrap batch, so
    //    a violating key is rejected where it first enters the table. (A
    //    cross-batch violation cannot be detected without a by-key table
    //    scan; it remains a documented contract.)
    val guard = df
      .groupBy(recordKeys.map(col): _*)
      .agg(countDistinct(col(partitionSource)).as("__n"))
      .agg(count(lit(1)).as("__keys"), coalesce(max(col("__n")), lit(0L)).as("__maxn"))
      .head()
    // changelog for the degenerate paths: vs an empty "existing" side,
    // every batch winner is an insert (vacuously empty for empty batches)
    def bootstrapChanges(): Option[DataFrame] =
      if (!withChanges) None
      else {
        val inc = prep(df)
        Some(changelog(inc.limit(0), inc).localCheckpoint(true))
      }

    if (guard.getLong(0) == 0L) return bootstrapChanges() // empty batch
    if (guard.getLong(1) > 1L) {
      // failure path only: one extra pass to name a violating key in the
      // error (ADVICE r3 — the folded guard had stopped reporting it),
      // costing nothing when the batch is valid
      val offender = df
        .groupBy(recordKeys.map(col): _*)
        .agg(countDistinct(col(partitionSource)).as("__n"))
        .filter(col("__n") > 1)
        .limit(1).collect().headOption
        .map(r => recordKeys.zipWithIndex
          .map { case (k, i) => s"$k=${r.get(i)}" }.mkString(", "))
        .getOrElse("<batch changed between guard and report>")
      throw new IllegalArgumentException(
        s"KeyedLakeTable($path): record key ($offender) has multiple " +
          s"$partitionSource values in one batch — the partition source " +
          "must be immutable per key")
    }

    if (!exists) { overwrite(df); return bootstrapChanges() }

    val incoming = prep(df)

    // Partition pruning: collect the partition tuples the batch touches
    // (bounded by batch row count; in practice a handful of minutes).
    val touched = incoming.select(partCols.map(col): _*).distinct().collect()
    if (touched.isEmpty) return bootstrapChanges()

    // Read only the touched partitions of the existing table. The filter
    // must reference the RAW partition columns (whatever type Spark's
    // partition discovery gave them) with type-matched literals so
    // PruneFileSourcePartitions actually prunes the listing — filtering on
    // a normalized projection would scan every partition. Normalization to
    // zero-padded strings happens after the filter (projection over a
    // pruned scan).
    val raw = rawRead(mergeSchema = false)
    val partTypes = raw.schema.fields.map(f => f.name -> f.dataType).toMap
    def partLit(c: String, v: String) = partTypes(c) match {
      case org.apache.spark.sql.types.StringType => lit(v)
      case _ => lit(v.toInt) // inference only ever yields integral types here
    }
    val partFilter = touched.map { r =>
      partCols.zipWithIndex
        .map { case (c, i) => col(c) === partLit(c, r.getString(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val existing = normalizeParts(raw.filter(partFilter))

    // Union with a source-priority column. With no configured tieBreak,
    // equal precombine values resolve for the incoming row (Hudi precombine
    // tie behavior). With a tieBreak, the tieBreak is the total order — it
    // must rank ABOVE __src, or equal-precombine versions of a key split
    // across batches would resolve by arrival order and the merge result
    // would depend on batching (ADVICE r2: batch-split invariance).
    val srcTie =
      if (tieBreak.isEmpty) Seq(col("__src").desc)
      else tieBreak.map(c => col(c).desc) :+ col("__src").desc
    // Same-name-different-type is an error in BOTH modes: evolution adds
    // and omits columns, it never reinterprets one.
    val exTypes = existing.schema.map(f => f.name -> f.dataType).toMap
    val typeConflicts = incoming.schema
      .filter(f => exTypes.get(f.name).exists(_ != f.dataType))
      .map(f => s"${f.name}: table=${exTypes(f.name).sql} batch=${f.dataType.sql}")
    require(typeConflicts.isEmpty,
      s"KeyedLakeTable($path): column type changed between table and " +
        s"batch — ${typeConflicts.mkString("; ")}. Schema evolution " +
        "adds/omits columns; a type change needs an explicit migration.")
    val merged = (if (evolveSchema) {
      LakeOps.latestWinsDedup(
        existing.withColumn("__src", lit(0))
          .unionByName(incoming.withColumn("__src", lit(1)),
            allowMissingColumns = true),
        recordKeys, precombine, srcTie)
    } else {
      val missing = existing.columns.toSet.diff(incoming.columns.toSet) ++
        incoming.columns.toSet.diff(existing.columns.toSet)
      require(missing.isEmpty,
        s"KeyedLakeTable($path): batch columns differ from the table's " +
          s"(${missing.mkString(", ")}) — pass evolveSchema=true if this " +
          "is a deliberate source schema change")
      val cols = incoming.columns.filterNot(_ == "__src")
      LakeOps.latestWinsDedup(
        existing.withColumn("__src", lit(0)).select((cols :+ "__src").map(col): _*)
          .unionByName(incoming.withColumn("__src", lit(1))
            .select((cols :+ "__src").map(col): _*)),
        recordKeys, precombine, srcTie)
    }).drop("__src")

    // The change feed must be computed (and materialized — it reads the
    // partitions the write below replaces) BEFORE the overwrite. The
    // existing side is deduped first: after [[upsertDeferred]] appends a
    // key holds MULTIPLE accumulated versions in the raw read, and
    // joining incoming against them would emit one change row per stale
    // version — downstream IncrementalAgg would retract every old image
    // and drift. On an eagerly-merged table the dedup finds one version
    // per key and passes rows through; its by-key window partitioning is
    // the same key the changelog join shuffles on.
    val changes =
      if (withChanges) Some(changelog(
        LakeOps.latestWinsDedup(existing, recordKeys, precombine,
          tieBreak.map(c => col(c).desc)),
        incoming).localCheckpoint(true))
      else None

    // The merged frame reads from `path`; truncate lineage before the
    // dynamic partition overwrite of the same path (Spark refuses a write
    // whose plan still scans the destination). Touched partitions are
    // bounded by the batch, so the checkpoint is batch-sized, not
    // table-sized.
    val materialized = merged.localCheckpoint(true)

    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      clustered(materialized).write
        .mode(SaveMode.Overwrite)
        .partitionBy(partCols: _*)
        .parquet(path)
      bumpCommit()
    } finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    changes
  }

  /** Normalize partition columns to the zero-padded strings the partition
    * scheme is defined over. Spark's partition type inference would read
    * `create_minute=04` back as int 4, and a merge would then write a
    * *second* `create_minute=4` directory for the same logical partition —
    * normalizing makes the table's schema independent of the session's
    * `partitionColumnTypeInference` setting. */
  private def normalizeParts(df: DataFrame): DataFrame = {
    val widths = Map("create_year" -> 4).withDefaultValue(2)
    partCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, lpad(col(c).cast("string"), widths(c), "0"))
    }
  }

  /** Footer-merged read: after a schema-evolving upsert, partitions the
    * evolving batch never touched still hold old-schema files, and a
    * sample-one-footer read would drop the new columns. `mergeSchema`
    * reconciles footers in a distributed job — O(files) metadata, no data
    * scan — which is the price of evolution until a compaction pass
    * rewrites old partitions to the current schema. */
  def read(): DataFrame =
    normalizeParts(rawRead(mergeSchema = true))

  /** The LIVE rows of a soft-delete table: [[read]] minus tombstones —
    * what every analytic consumer queries. Tombstone rows stay in the
    * table (they are what stops an out-of-order older version from
    * resurrecting a deleted key); reclaiming them physically is a
    * retention decision, not a read-path one. */
  def readLive(): DataFrame = {
    val f = softDeleteCol.getOrElse(throw new IllegalStateException(
      s"KeyedLakeTable($path): readLive needs spec.softDeleteCol"))
    read().filter(!coalesce(col(f), lit(false)))
  }

  /** Hive-sync analog (`initial_load.py:168-174`): make the table queryable
    * through `spark.sql` for this session. */
  def registerAs(name: String): Unit = read().createOrReplaceTempView(name)

  /** Persistent hive-sync (`initial_load.py:168-174` + the Glue catalog it
    * writes through, `glue_catalog.py:86-97`): register this lake table as
    * an external catalog table so it survives the session — partition
    * pruning then resolves against catalog partitions, metadata-only. */
  def registerInCatalog(db: String, name: String): Unit =
    graft.catalog.LakeCatalog.registerParquet(spark, db, name, path, partCols)

  def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
