package graft.sink

import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.ops.LakeOps

/** One committed snapshot: the FULL partition→files map of the table at
  * `version` (file paths relative to the table root, so the table moves
  * wholesale). Untouched partitions carry their entries forward, so any
  * manifest alone describes a complete, immediately-readable snapshot —
  * no log replay. */
final case class CommitManifest(version: Int, committedAt: String,
    partitions: Map[String, Seq[String]])

/** Multi-version keyed lake table: the [[KeyedLakeTable]] merge semantics
  * under a commit log, giving snapshot reads (time travel), rollback, and
  * safe vacuum — the Hudi-COPY_ON_WRITE commit-timeline capabilities the
  * reference leans on (`incremental.py` writes through Hudi's timeline;
  * `README.rst:99-117` replays history), re-expressed with no table-format
  * dependency.
  *
  * Layout: `data/<v>/<partition dirs>/part-*.parquet` (files are IMMUTABLE
  * once written — a merge writes its touched partitions' new state under
  * the new version's dir and never edits old files) + `_commits/<v>.json`
  * manifests. A commit is one atomic manifest rename; readers resolve a
  * version's file set from its manifest alone, never by listing — at
  * 100 TB that replaces the O(files) directory walk with an O(touched)
  * metadata read, which is precisely why real table formats exist.
  *
  * Scale notes: a snapshot's manifest is O(partitions) JSON — far past
  * ~10⁷ partitions you'd split it hierarchically (documented bound). A
  * long-lived table's snapshot spans many version dirs; [[read]] issues
  * one parquet scan per referenced version dir and unions them (plan size
  * grows with distinct versions touched — periodic compaction through
  * [[graft.sink.Compaction]]-style rewrite of old partitions into a fresh
  * commit collapses it). Manifest renames are atomic on POSIX/HDFS;
  * object stores need a conditional-put primitive instead (documented).
  */
final class VersionedLakeTable(spark: SparkSession, val spec: LakeTableSpec) {
  import spec._

  private implicit val formats: Formats = DefaultFormats
  private val partCols = LakeOps.partitionCols
  private def commitsDir = Paths.get(path, "_commits")

  // ------------------------------------------------------------ manifests

  private def children(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = JFiles.list(p)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) buf += it.next()
      buf.toSeq
    } finally s.close()
  }

  def versions: Seq[Int] =
    if (!JFiles.isDirectory(commitsDir)) Seq.empty
    else children(commitsDir).map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt).sorted

  def latestVersion: Option[Int] = versions.lastOption

  private def manifest(v: Int): CommitManifest = {
    val p = commitsDir.resolve(f"$v%08d.json")
    require(JFiles.exists(p),
      s"VersionedLakeTable($path): no commit $v — available: " +
        s"${versions.mkString(", ")} (vacuumed or never written)")
    JsonMethods.parse(JFiles.readString(p)).extract[CommitManifest]
  }

  private def commit(m: CommitManifest): Int = {
    JFiles.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(f".${m.version}%08d.json.tmp")
    JFiles.writeString(tmp, Serialization.writePretty(m))
    JFiles.move(tmp, commitsDir.resolve(f"${m.version}%08d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    m.version
  }

  // ------------------------------------------------------------ read side

  /** The table as of `version` (default: latest). Files are resolved from
    * the manifest; each referenced version dir is one parquet scan with
    * its own basePath (partition columns come from the dir names), unioned
    * and normalized. */
  def read(version: Option[Int] = None): DataFrame =
    readWhere(version, _ => true)

  /** [[read]] with MANIFEST-LEVEL partition pruning: `keep` sees each
    * partition's column→value map (zero-padded directory strings) and only
    * the surviving partitions' files reach the scan at all. This is the
    * pruning a manifest exists to give — a predicate Spark could only
    * apply after listing every referenced file is applied here to
    * O(partitions) metadata, so a one-day read of a year-long table builds
    * a one-day file list. Predicates over non-partition columns still
    * belong in a normal `.filter` on the result. */
  def readWhere(version: Option[Int],
      keep: Map[String, String] => Boolean): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(
        s"VersionedLakeTable($path): no commits yet"))
    val m = manifest(v)
    val kept = m.partitions.filter { case (rel, _) =>
      keep(rel.split('/').map { seg =>
        val Array(c, value) = seg.split("=", 2)
        c -> value
      }.toMap)
    }
    require(kept.nonEmpty,
      s"VersionedLakeTable($path): partition predicate pruned commit $v " +
        "to nothing — an empty snapshot slice is almost always a predicate " +
        "bug (values are the zero-padded partition strings)")
    val byVersionDir = kept.values.flatten.toSeq
      .groupBy(f => f.split('/').take(2).mkString("/")) // data/<n>
    byVersionDir.toSeq.sortBy(_._1)
      .map { case (vdir, files) =>
        spark.read.option("basePath", s"$path/$vdir")
          .parquet(files.map(f => s"$path/$f"): _*)
      }
      .reduce(_ unionByName _)
      .transform(normalizeParts)
  }

  // ----------------------------------------------------------- write side

  /** Keyed latest-wins merge committed as a NEW version; returns it.
    * Same semantics as [[KeyedLakeTable.upsert]]: in-batch dedup, pruned
    * read of touched partitions (manifest-resolved here), strictly-newer
    * (precombine, tieBreak) wins, ties to the incoming row only without a
    * tieBreak. Old versions stay readable until vacuumed. */
  def upsert(df: DataFrame): Int = {
    val guarded = df.withColumn(partitionSource,
      coalesce(col(partitionSource), raise_error(lit(
        s"VersionedLakeTable($path): null $partitionSource in batch"))))
    val incoming = LakeOps.latestWinsDedup(
      LakeOps.derivePartitionColumns(LakeOps.dropOp(guarded), partitionSource),
      recordKeys, precombine, tieBreak.map(c => col(c).desc))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try upsertPrepped(incoming)
    finally incoming.unpersist(false)
  }

  private def partitionRelPath(r: org.apache.spark.sql.Row): String =
    partCols.zipWithIndex
      .map { case (c, i) => s"$c=${r.getString(i)}" }.mkString("/")

  private def upsertPrepped(incoming: DataFrame): Int = {
    val touched = incoming.select(partCols.map(col): _*).distinct().collect()
      .map(partitionRelPath).toSet
    val current = latestVersion.map(manifest)
    val nextV = current.map(_.version + 1).getOrElse(0)
    if (touched.isEmpty) // empty batch: no new version, nothing written
      return current.map(_.version).getOrElse(
        throw new IllegalStateException(
          s"VersionedLakeTable($path): empty bootstrap batch"))

    val merged = current match {
      case None => incoming
      case Some(m) =>
        val files = m.partitions.filter { case (p, _) => touched(p) }
          .values.flatten.toSeq
        if (files.isEmpty) incoming
        else {
          val byVersionDir = files.groupBy(_.split('/').take(2).mkString("/"))
          val existing = byVersionDir.toSeq.sortBy(_._1)
            .map { case (vdir, fs) =>
              spark.read.option("basePath", s"$path/$vdir")
                .parquet(fs.map(f => s"$path/$f"): _*)
            }
            .reduce(_ unionByName _)
            .transform(normalizeParts)
          val srcTie =
            if (tieBreak.isEmpty) Seq(col("__src").desc)
            else tieBreak.map(c => col(c).desc) :+ col("__src").desc
          val cols = incoming.columns
          LakeOps.latestWinsDedup(
            existing.withColumn("__src", lit(0))
              .select((cols :+ "__src").map(col): _*)
              .unionByName(incoming.withColumn("__src", lit(1))
                .select((cols :+ "__src").map(col): _*)),
            recordKeys, precombine, srcTie)
            .drop("__src")
        }
    }

    // immutable-file contract: new state lands under data/<nextV> only
    val outDir = s"$path/data/$nextV"
    merged.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(outDir)

    // manifest entries for what was just written (walk data/<nextV>)
    val written = listWritten(Paths.get(outDir), nextV)
    require(written.keySet == touched,
      s"VersionedLakeTable($path): wrote partitions ${written.keySet} " +
        s"but batch touched $touched")
    val merged2 = current.map(_.partitions).getOrElse(Map.empty) ++ written
    commit(CommitManifest(nextV,
      java.time.Instant.now().toString, merged2))
  }

  private def listWritten(dir: java.nio.file.Path, v: Int): Map[String, Seq[String]] = {
    def walk(p: java.nio.file.Path, depth: Int): Seq[(String, String)] =
      children(p).flatMap { c =>
        val n = c.getFileName.toString
        if (depth == 0) {
          if (JFiles.isRegularFile(c) && !n.startsWith("_") && !n.startsWith("."))
            Seq((dir.relativize(c.getParent).toString,
              s"data/$v/${dir.relativize(c)}"))
          else Seq.empty
        } else if (JFiles.isDirectory(c) && !n.startsWith("_"))
          walk(c, depth - 1)
        else Seq.empty
      }
    walk(dir, partCols.length).groupBy(_._1)
      .map { case (k, v2) => k -> v2.map(_._2).sorted }
  }

  // --------------------------------------------------------- time travel

  /** Restore the table to snapshot `v` as a NEW commit (history preserved:
    * the bad commits stay readable until vacuumed). */
  def rollback(v: Int): Int = {
    val target = manifest(v)
    val nextV = latestVersion.get + 1
    commit(CommitManifest(nextV, java.time.Instant.now().toString,
      target.partitions))
  }

  /** Rewrite the CURRENT snapshot wholesale under one fresh version dir
    * and commit it. A long-lived table's snapshot comes to span many
    * version dirs (one parquet scan each at read time — the documented
    * plan-growth caveat) and many small files; this collapses both to one
    * scan and one file per partition. Old snapshots stay readable until
    * vacuumed; a vacuum AFTER a compaction reclaims everything the
    * compacted snapshot superseded. Cost: one full read+write of the
    * LIVE table — the same pay-once economics as [[Compaction.compact]],
    * but driven by the manifest, so it is also the schema-current rewrite
    * that retires old-schema files. */
  def compactSnapshot(): Int = {
    val cur = latestVersion.getOrElse(throw new IllegalStateException(
      s"VersionedLakeTable($path): nothing to compact — no commits"))
    val nextV = cur + 1
    val outDir = s"$path/data/$nextV"
    read(Some(cur)).repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(outDir)
    val written = listWritten(Paths.get(outDir), nextV)
    commit(CommitManifest(nextV, java.time.Instant.now().toString, written))
  }

  /** Drop snapshots before `keepFrom` and delete every data file no
    * remaining snapshot references. Returns deleted file count. */
  def vacuumBefore(keepFrom: Int): Int = {
    val (drop, keep) = versions.partition(_ < keepFrom)
    require(keep.nonEmpty,
      s"VersionedLakeTable($path): vacuumBefore($keepFrom) would drop " +
        "every commit")
    val live = keep.flatMap(v => manifest(v).partitions.values.flatten).toSet
    var deleted = 0
    val dataDir = Paths.get(path, "data")
    if (JFiles.isDirectory(dataDir)) {
      val root = Paths.get(path)
      val s = JFiles.walk(dataDir)
      try {
        val it = s.iterator()
        val doomed = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        while (it.hasNext) {
          val p = it.next()
          if (JFiles.isRegularFile(p) && !live(root.relativize(p).toString))
            doomed += p
        }
        doomed.foreach { p => JFiles.delete(p); deleted += 1 }
      } finally s.close()
    }
    drop.foreach(v => JFiles.deleteIfExists(
      commitsDir.resolve(f"$v%08d.json")))
    deleted
  }

  /** Hive-sync analog for a snapshot: expose `read(version)` through
    * `spark.sql` for this session — `AS OF` queries by view name. */
  def registerAs(name: String, version: Option[Int] = None): Unit =
    read(version).createOrReplaceTempView(name)

  private def normalizeParts(df: DataFrame): DataFrame = {
    val widths = Map("create_year" -> 4).withDefaultValue(2)
    partCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, lpad(col(c).cast("string"), widths(c), "0"))
    }
  }
}
