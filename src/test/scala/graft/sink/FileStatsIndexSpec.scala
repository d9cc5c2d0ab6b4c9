package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Workload

class FileStatsIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def statsSpec(path: String) = LakeTableSpec(
    path = path, recordKeys = Seq("id"),
    precombine = "update_at", partitionSource = "create_at")

  private def statsTable(bloomBits: Int = 1 << 12): VersionedLakeTable =
    new VersionedLakeTable(spark, statsSpec(tmpDir("vstats")),
      statsCols = Seq("amount", "entity"), keyBloomBits = bloomBits)

  /** `nParts` minute partitions, `perPart` keys each; partition `p` holds
    * amounts [p*100, p*100+perPart) and entity `e<p>` — so each data file
    * has a DISJOINT amount range and a single entity value, the layout
    * where file skipping should collapse a non-partition-column predicate
    * to one file. */
  private def txnsAcrossMinutes(nParts: Int, perPart: Int): Seq[Workload.Txn] =
    for { p <- 0 until nParts; i <- 0 until perPart } yield {
      val t = f"2024-01-01T00:$p%02d:01.000000+0000"
      Workload.Txn(f"k$p-$i", "a1", t, t, f"e$p%02d", p * 100 + i, 0, "v1")
    }

  test("driver keyHash matches frame-side xxhash64 exactly") {
    val ids = Seq("a", "k7-3", "nope", "")
    val frame = ids.toDF("id")
      .select(xxhash64(concat_ws("\u0000", col("id").cast("string"))).as("h"))
      .as[Long].collect().toSeq
    assert(frame === ids.map(id => FileStatsIndex.keyHash(Seq(id))))
  }

  test("BloomAgg: no false negatives, bounded false positives") {
    val bits = 1 << 12
    val b = new graft.functions.BloomAgg(bits, 6)
    val buf = (0 until 500).map(i => FileStatsIndex.keyHash(Seq(s"k$i")))
      .foldLeft(b.zero)(b.reduce)
    (0 until 500).foreach { i =>
      assert(graft.functions.BloomAgg.mayContain(buf, bits, 6,
        FileStatsIndex.keyHash(Seq(s"k$i"))), s"k$i must be present")
    }
    val fp = (0 until 2000).count(i => graft.functions.BloomAgg.mayContain(
      buf, bits, 6, FileStatsIndex.keyHash(Seq(s"absent$i"))))
    assert(fp < 200, s"false-positive rate too high: $fp/2000")
  }

  test("sidecar stats are exact per file: min/max/nulls/rows, typed kinds") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(4, 10).toDF())
    val sc = FileStatsIndex.readSidecar(table.spec.path, 0).get
    assert(sc.files.nonEmpty)
    val totalRows = sc.files.values.map(_.rows).sum
    assert(totalRows === 40L)
    sc.files.foreach { case (f, fs) =>
      val a = fs.cols("amount")
      assert(a.kind === "i" && a.nulls === 0L)
      // disjoint construction: each file spans exactly one partition's range
      assert(BigInt(a.max.get) - BigInt(a.min.get) < 100)
      assert(fs.cols("entity").kind === "s")
      assert(fs.bloom.isDefined, s"$f must carry a key bloom")
    }
  }

  test("range pruning keeps only files whose min/max overlap the predicate") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(8, 10).toDF())
    val keep = (fs: FileStats) =>
      fs.cols("amount").overlaps(Some(205), Some(208))
    val (kept, total) = table.pruneReport(None, keep)
    assert(total >= 8, s"expected >= 8 files, got $total")
    assert(kept === 1, s"disjoint ranges must prune to 1 file, kept $kept")
    val pruned = table.readWhereStats(None, keepFile = keep)
      .filter($"amount".between(205, 208))
    val full = table.read().filter($"amount".between(205, 208))
    assert(pruned.select("id").as[String].collect().sorted ===
      full.select("id").as[String].collect().sorted)
    assert(pruned.inputFiles.length === 1)
    // string-kind pruning composes the same way
    val keepE = (fs: FileStats) =>
      fs.cols("entity").overlaps(Some("e03"), Some("e04"))
    assert(table.pruneReport(None, keepE)._1 === 2)
  }

  test("bloom point lookup reads a bounded file subset and exact rows") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(16, 20).toDF())
    val out = table.lookupKeys(Seq(Seq("k7-3"), Seq("k12-19")))
    assert(out.select("id").as[String].collect().toSet ===
      Set("k7-3", "k12-19"))
    // the scan must touch far fewer files than the table holds
    assert(out.inputFiles.length <= 4,
      s"bloom should prune 16 files to ~2, scanned ${out.inputFiles.length}")
    assert(table.lookupKeys(Seq(Seq("no-such-key"))).count() === 0L)
    intercept[IllegalArgumentException](table.lookupKeys(Seq(Seq("a", "b"))))
  }

  test("readForJoin: join-pruned read equals the plain join on a " +
      "bounded file subset, degrades loudly past the key cap") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(16, 20).toDF())
    val probe = Seq("k7-3", "k12-19", "absent").toDF("id")
    val pruned = table.readForJoin(probe)
    assert(pruned.inputFiles.length <= 4,
      s"bloom should prune 16 files to ~2, scanned ${pruned.inputFiles.length}")
    assert(pruned.join(probe, Seq("id")).select("id").as[String]
      .collect().toSet === Set("k7-3", "k12-19"))
    // over-cap fallback: full snapshot, still the same join answer
    val fallback = table.readForJoin(probe, maxKeys = 1)
    assert(fallback.inputFiles.length === table.read().inputFiles.length,
      "past the cap the read must be the plain (unpruned) snapshot")
    assert(fallback.join(probe, Seq("id")).count() === 2L)
    // a probe frame without the record-key column fails loudly
    intercept[IllegalArgumentException](
      table.readForJoin(Seq(1).toDF("not_the_key")))
  }

  test("readForJoin composes with time travel: a pruned historical join " +
      "equals the plain historical join") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(8, 10).toDF())
    // v1 overwrites k2-1 with a newer amount; a v0 read must see the old
    val upd = txnsAcrossMinutes(8, 10).filter(_.id == "k2-1")
      .map(_.copy(update_at = "2024-01-01T00:02:09.000000+0000",
        amount = 55555))
    table.upsert(upd.toDF())
    val probe = Seq("k2-1").toDF("id")
    val v0 = table.readForJoin(probe, version = Some(0)).join(probe, Seq("id"))
    assert(v0.select("amount").as[Int].head() === 201,
      "the v0 pruned join must see the ORIGINAL amount")
    val v1 = table.readForJoin(probe).join(probe, Seq("id"))
    assert(v1.select("amount").as[Int].head() === 55555)
  }

  test("readForJoinOn: range-pruned join on a stats column equals the " +
      "plain join; cap fallback; non-stats column refused") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(16, 20).toDF())
    // partition p holds amounts [p*100, p*100+20): two values in two
    // different partitions' files, one value matching nothing
    val probe = Seq(305, 1210, 99999).toDF("amount")
    val pruned = table.readForJoinOn("amount", probe)
    assert(pruned.inputFiles.length <= 2,
      s"range stats should prune 16 files to 2, got ${pruned.inputFiles.length}")
    assert(pruned.join(probe, Seq("amount")).select("id").as[String]
      .collect().toSet === Set("k3-5", "k12-10"))
    val fallback = table.readForJoinOn("amount", probe, maxKeys = 1)
    assert(fallback.inputFiles.length === table.read().inputFiles.length)
    assert(fallback.join(probe, Seq("amount")).count() === 2L)
    intercept[IllegalArgumentException](
      table.readForJoinOn("note", Seq("v1").toDF("note")))
  }

  test("readForJoinOn pins the probe to the table column's type") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(16, 20).toDF())
    // `amount` is an integral stats column (kind "i"): an untyped probe
    // frame (doubles, strings — the analyst reality) must neither throw
    // from BigInt inside the prune predicate nor silently prune files
    // that hold matching rows. 305.0 and "1210" cast cleanly and must
    // prune to the same two files; 305.5 can match no stored int and
    // may prune to nothing.
    val doubles = Seq(305.0, 1210.0).toDF("amount")
    val prunedD = table.readForJoinOn("amount", doubles)
    assert(prunedD.inputFiles.length <= 2,
      s"typed-cast probe should prune 16 files to 2, got " +
        s"${prunedD.inputFiles.length}")
    assert(prunedD.filter($"amount".isin(305, 1210)).select("id")
      .as[String].collect().toSet === Set("k3-5", "k12-10"))
    val strings = Seq("305", "1210", "not-a-number").toDF("amount")
    assert(table.readForJoinOn("amount", strings)
      .filter($"amount".isin(305, 1210)).count() === 2L,
      "string probes must cast to the table type; uncastable values " +
        "drop (they can match no stored row)")
  }

  test("readForJoinOn refuses an append (merge-on-read) chain loudly") {
    val table = new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("vjoinonmor"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("entity")),
      statsCols = Seq("amount", "entity"), keyBloomBits = 1 << 12)
    val base = txnsAcrossMinutes(4, 5)
    table.upsert(base.toDF())
    table.upsertDeferred(base.filter(_.id == "k2-1")
      .map(_.copy(update_at = "2024-01-01T00:02:09.000000+0000")).toDF())
    // range pruning is not key-complete over appends — a pruned file may
    // hold the winning version of a key whose stale version survives
    val e = intercept[IllegalArgumentException](
      table.readForJoinOn("amount", Seq(201).toDF("amount")).collect())
    assert(e.getMessage.contains("key-complete"))
  }

  test("readForJoin composes with an append (merge-on-read) chain: " +
      "the WINNING version survives pruning") {
    val table = new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("vjoinmor"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("entity")),
      statsCols = Seq("amount", "entity"), keyBloomBits = 1 << 12)
    val base = txnsAcrossMinutes(8, 10)
    table.upsert(base.toDF())
    // newer version of k2-1 lands as an APPEND (merge-on-read) commit
    val upd = base.filter(_.id == "k2-1")
      .map(_.copy(update_at = "2024-01-01T00:02:09.000000+0000",
        amount = 99999))
    table.upsertDeferred(upd.toDF())
    val probe = Seq("k2-1", "k5-5").toDF("id")
    val out = table.readForJoin(probe).join(probe, Seq("id"))
    assert(out.count() === 2L)
    assert(out.filter($"id" === "k2-1").select("amount").as[Int].head()
      === 99999, "append-chain pruning must keep the winning version")
  }

  test("files committed before indexing are conservatively kept") {
    val path = tmpDir("vstats-mixed")
    val plain = new VersionedLakeTable(spark, statsSpec(path))
    plain.upsert(txnsAcrossMinutes(4, 5).toDF()) // v0: no sidecar
    val indexed = new VersionedLakeTable(spark, statsSpec(path),
      statsCols = Seq("amount", "entity"), keyBloomBits = 1 << 12)
    // v1 touches DIFFERENT minutes, so v0 files carry forward
    val later = txnsAcrossMinutes(8, 5).drop(20)
    indexed.upsert(later.toDF())
    assert(FileStatsIndex.readSidecar(path, 0).isEmpty)
    assert(FileStatsIndex.readSidecar(path, 1).isDefined)
    // an impossible range still keeps every unindexed v0 file
    val keep = (fs: FileStats) =>
      fs.cols("amount").overlaps(Some(1000000), Some(2000000))
    val (kept, total) = indexed.pruneReport(None, keep)
    assert(total >= 8 && kept >= 4, s"v0 files must survive: $kept/$total")
    val got = indexed.readWhereStats(None, keepFile = keep)
      .filter($"amount" >= 1000000)
    assert(got.count() === 0L)
  }

  test("pruning every file yields an empty, correctly-typed slice") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(3, 5).toDF())
    val none = table.readWhereStats(None, keepFile = _ => false)
    assert(none.count() === 0L)
    assert(none.columns.contains("amount") &&
      none.columns.contains("create_minute"))
  }

  test("bloom-pruned merge carries unhit files forward file-intact") {
    // one minute partition, 100 keys, 10 rows/file => ~10 file slices
    val table = new VersionedLakeTable(spark, statsSpec(tmpDir("vbloom-merge")),
      statsCols = Seq("amount"), keyBloomBits = 1 << 12,
      maxRecordsPerFile = 10)
    val t0 = "2024-01-01T00:05:01.000000+0000"
    val boot = (0 until 100).map(i =>
      Workload.Txn(f"k$i%03d", "a1", t0, t0, "fuel", i, 0, "v1"))
    table.upsert(boot.toDF())
    val v0files = FileStatsIndex.readSidecar(table.spec.path, 0).get.files
    assert(v0files.size >= 8, s"expected ~10 file slices, got ${v0files.size}")
    // update 3 keys: only the slices holding them may be rewritten
    val t1 = "2024-01-01T00:05:02.000000+0000"
    val upd = Seq("k003", "k047", "k091").map(k =>
      Workload.Txn(k, "a1", t0, t1, "fuel", 999, 0, "v2"))
    table.upsert(upd.toDF())
    val manifestText = java.nio.file.Files.readString(java.nio.file.Paths.get(
      table.spec.path, "_commits", "00000001.json"))
    val carriedCount = v0files.keys.count(manifestText.contains)
    assert(carriedCount >= 5,
      s"most v0 file slices must carry forward unrewritten, got $carriedCount")
    // final state exact: 100 keys, 3 updated
    assert(table.read().count() === 100L)
    val amounts = table.read().select($"id", $"amount")
      .as[(String, Int)].collect().toMap
    assert(amounts("k003") === 999 && amounts("k047") === 999 &&
      amounts("k091") === 999)
    assert(amounts("k000") === 0 && amounts("k099") === 99)
    // carried files must still prune/read correctly via their v0 sidecar
    val (kept, total) = table.pruneReport(None,
      fs => fs.cols("amount").overlaps(Some(999), Some(999)))
    assert(kept < total, "range pruning must still work post-carry")
  }

  test("clusterBy makes file slices disjoint in the cluster key") {
    val table = new VersionedLakeTable(spark, statsSpec(tmpDir("vcluster")),
      statsCols = Seq("amount"), maxRecordsPerFile = 10,
      clusterBy = Seq("amount"))
    // ONE minute partition, 100 amounts inserted in shuffled order
    val t0 = "2024-01-01T00:09:01.000000+0000"
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0 until 100).toList).zipWithIndex.map {
      case (a, i) => Workload.Txn(f"c$i%03d", "a1", t0, t0, "fuel", a, 0, "v1")
    }
    table.upsert(rows.toDF())
    val sc = FileStatsIndex.readSidecar(table.spec.path, 0).get
    val ranges = sc.files.values
      .map(fs => (BigInt(fs.cols("amount").min.get),
        BigInt(fs.cols("amount").max.get)))
      .toSeq.sortBy(_._1)
    assert(ranges.size >= 8, s"expected ~10 slices, got ${ranges.size}")
    ranges.sliding(2).foreach {
      case Seq((_, amax), (bmin, _)) =>
        assert(amax < bmin, s"slices overlap: $ranges")
      case _ =>
    }
    // a point predicate therefore collapses to exactly one slice
    val (kept, total) = table.pruneReport(None,
      FileStatsIndex.range("amount", Some(55), Some(55)))
    assert(kept === 1 && total === ranges.size)
  }

  test("countRows answers from metadata on an indexed table: zero jobs") {
    val table = statsTable()
    table.upsert(txnsAcrossMinutes(6, 10).toDF())
    assert(table.read().count() === 60L) // ground truth (scans)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(table.countRows() === 60L)
      Thread.sleep(500)
      assert(jobs.get() === 0,
        s"metadata count launched ${jobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // mixed table: unindexed v0 files are scan-counted, still exact
    val path = tmpDir("vcount-mixed")
    val plain = new VersionedLakeTable(spark, statsSpec(path))
    plain.upsert(txnsAcrossMinutes(4, 5).toDF())
    val indexed = new VersionedLakeTable(spark, statsSpec(path),
      statsCols = Seq("amount"), keyBloomBits = 1 << 12)
    indexed.upsert(txnsAcrossMinutes(8, 5).drop(20).toDF())
    assert(indexed.countRows() === indexed.read().count())
  }

  test("footer harvest == aggregation scan, byte-identical sidecar entries " +
    "(int/string/decimal/float/double kinds, with and without bloom)") {
    val dir = tmpDir("vfooter") + "/data/0"
    // exercise every footer-renderable kind, nulls included, across
    // several files (one per partition dir, like a real version dir)
    val rows = (0 until 60).map { i =>
      (f"k$i%03d", f"p=${i % 3}", i.toLong,
       if (i % 7 == 0) null else f"e$i%02d",
       BigDecimal(i) / 100, i.toFloat / 3, i.toDouble / 7)
    }
    rows.toDF("id", "p", "amount", "entity", "dec", "f", "d")
      .withColumn("dec", $"dec".cast("decimal(10,2)"))
      .repartition($"p")
      .write.partitionBy("p").parquet(dir)
    val tablePath = dir.stripSuffix("/data/0")
    val statsCols = Seq("amount", "entity", "dec", "f", "d")
    val scan = FileStatsIndex.scanStats(spark, tablePath, dir, statsCols,
      Seq("id"), 0)
    val footer = FileStatsIndex.footerStats(spark, tablePath, dir, statsCols)
    assert(footer.isDefined, "footer stats must be present for these kinds")
    assert(footer.get === scan, "producers must emit identical entries")
    // with bloom: footer stats + narrow key scan == full scan producer
    val bits = 1 << 12
    val scanB = FileStatsIndex.scanStats(spark, tablePath, dir, statsCols,
      Seq("id"), bits)
    val footerB = FileStatsIndex.withBlooms(spark, tablePath, dir,
      footer.get, Seq("id"), bits)
    assert(footerB === scanB)
  }

  test("footer-harvest write path launches zero Spark jobs (no bloom)") {
    val table = new VersionedLakeTable(spark, statsSpec(tmpDir("vnojobs")),
      statsCols = Seq("amount", "entity"))
    table.upsert(txnsAcrossMinutes(4, 10).toDF())
    // re-produce v0's sidecar in isolation and count jobs: the harvest is
    // driver-side footer metadata only
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val before = FileStatsIndex.readSidecar(table.spec.path, 0).get
    spark.sparkContext.addSparkListener(listener)
    try {
      FileStatsIndex.writeSidecar(spark, table.spec.path, 0,
        Seq("amount", "entity"), Seq("id"), 0)
      Thread.sleep(500)
      assert(jobs.get() === 0,
        s"footer harvest launched ${jobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    val after = FileStatsIndex.readSidecar(table.spec.path, 0).get
    assert(after.files === before.files.map { case (f, fs) =>
      f -> fs.copy(bloom = None) }, "re-harvest must reproduce the stats")
  }

  test("timestamp statsCols fall back to the scan producer and still " +
    "index correctly") {
    val dir = tmpDir("vts") + "/data/0"
    val rows = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("b", java.sql.Timestamp.valueOf("2024-03-05 00:30:00")))
    rows.toDF("id", "at").write.parquet(dir)
    val tablePath = dir.stripSuffix("/data/0")
    FileStatsIndex.writeSidecar(spark, tablePath, 0, Seq("at"), Seq("id"), 0)
    val sc = FileStatsIndex.readSidecar(tablePath, 0).get
    val all = sc.files.values.flatMap(_.cols("at").min).toSeq.sorted
    assert(all.nonEmpty && all.head.startsWith("2024-01-01 10:00"),
      s"scan fallback must render timestamps: $all")
  }

  test("all-null stats column never matches a range") {
    val cs = ColStats("i", None, None, 10)
    assert(!cs.overlaps(Some(0), Some(100)))
    assert(!cs.overlaps(None, None))
    // open-ended bounds on a populated column
    val pop = ColStats("i", Some("5"), Some("9"), 0)
    assert(pop.overlaps(Some(9), None))
    assert(!pop.overlaps(Some(10), None))
    assert(pop.overlaps(None, Some(5)))
    assert(!pop.overlaps(None, Some(4)))
  }
}
