package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Runs the headline queries on SPARK_GRAFT_SF_DIR: the
  * sub-second entries four times — one untimed warmup pass
  * (JVM/codegen/file-index warmup), then three timed passes, reporting the
  * per-query MINIMUM (the host shows up to 7× run-to-run CPU variance; min
  * is the standard noise-robust estimator) — and the tens-of-seconds ×100
  * scale entries each on a FRESH SparkSession with one untimed warmup pass
  * plus three timed passes (min-of-3). Sharing one JVM-long session across
  * the ×100 entries let
  * heap + shuffle-block pressure accumulate monotonically along the
  * sequence (q94 recorded 31 s in round 7's full run vs 4.6–6.3 s
  * isolated; a System.gc() between entries was not enough under load), so
  * each long entry now stops the previous SparkContext — dropping its
  * shuffle files and block-manager state — builds a fresh one, re-runs its
  * untimed `prepare`, and records the min of two timed passes. Codegen
  * caches are JVM-global, so the warmup from the short-query phase
  * carries over; min-of-2 absorbs the per-session file-index re-listing.
  * Emits a single JSON line on stdout (plus `bench_out.json` in cwd for
  * robustness against log interleaving): `queries` maps each entry to
  * its minimum (the driver's contract) and `samples` to the FULL sorted
  * per-pass list, so every recorded number carries its own run-to-run
  * spread — cross-session disputes (is a 4× movement a regression or a
  * variance patch?) are then decidable from the artifact alone.
  * Queries are fully materialized through the `noop` datasource so
  * column pruning cannot fake a win.
  *
  * Round-15 protocol additions:
  *  - `windows`: TWO same-invocation passes of the headline-8, each
  *    carrying BOTH engines' full sample arrays (DuckDB re-timed on the
  *    same relayout via tools/duck_time.py) — r14 proved single-window
  *    ratios at sub-second absolutes swing ±60% on identical code, so
  *    the quoted ratio is the cross-window band, read from the artifact.
  *  - decade entries (ScaleBench.freshNames) run in a fresh
  *    SparkContext each, fixture untimed, min-of-2.
  *  - warm read twins get THREE untimed warmups (JIT compile depth —
  *    see the inline note at the warm branch).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def makeSession(): SparkSession = {
      // engine defaults live in GraftSession (scan-floor batch size,
      // bucketed-scan ordering, shuffle=cores — each with its measured
      // rationale there); the bench adds only its experiment knob
      val s = GraftSession.configure(
          SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
        // experiment knob only — AQE stays ON by default (coalescing and
        // skew-join matter more at real scale than its per-query planning
        // cost at bench scale)
        .config("spark.sql.adaptive.enabled",
          sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = makeSession()

    // The driver's corpus tables are ONE parquet file with ONE row group
    // each — unsplittable by any engine's scan, so every pre-shuffle
    // stage of every query (the explode replications, partial aggregates,
    // join probes) would run on a single task. That is a fixture
    // artifact, not the target shape: a 100 TB table is thousands of
    // splits and the scan parallelizes. Relayout each table ONCE, untimed,
    // into defaultParallelism files (plain repartition+write — no sort, no
    // stats, nothing a warehouse ingest wouldn't do) and point the timed
    // queries at the relayout. Off-switch SPARK_GRAFT_RELAYOUT=false
    // reproduces the single-split numbers.
    val runDir =
      if (sys.env.get("SPARK_GRAFT_RELAYOUT").contains("false")) sfDir
      else {
        val d = Files.createTempDirectory("graft_bench_par").toString
        graft.Tables.names.foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.parquet(s"$d/$t.parquet")
        }
        d
      }

    // SPARK_GRAFT_BENCH_ONLY=q75_scale100_pricing,... — local iteration
    // filter mirroring Verify's; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.benchQueries
      .filter(n => only.forall(_.contains(n)))
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, runDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val (longQ, shortQ) = names.partition(SparkEntry.longBenchQueries.contains)
    // untimed ingest-side setup (e.g. bucketed table writes) so recorded
    // numbers are the steady-state read path
    names.foreach(n => SparkEntry.prepare.get(n).foreach(_(spark, runDir)))
    shortQ.foreach(runOne) // warmup pass
    val passes = (1 to 3).map(_ => shortQ.map(n => n -> runOne(n)).toMap)
    // Every entry records its FULL sorted sample list alongside the min:
    // the driver reads "queries" (min, unchanged contract) while
    // "samples" carries the spread a min-only artifact can't — three
    // rounds of cross-session disputes (r11 m_pq_encode, r12 wide2 +
    // m_compact_files_400) were all "is this number host variance or a
    // regression?", answerable only when the artifact itself shows the
    // run-to-run spread.
    val shortResults = shortQ.map { n =>
      n -> passes.map(_(n)).filter(_ >= 0).sorted
    }
    // Isolate each ×100 entry: a fresh SparkContext drops every shuffle
    // block and cached broadcast the previous entry left behind, and the
    // explicit GC releases the old context's heap before timing starts.
    // One UNTIMED warmup pass then absorbs the per-session one-offs that
    // are not the query's own cost (file-index listing of the prepared
    // tables, first-touch codegen), and min-of-3 rides out host variance
    // the same way the short entries do — round 8's q94 recorded 10.35 s
    // against a 2.35 s quiet-host rerun purely on first-pass listing +
    // variance.
    def runLongPass(ns: Seq[String]): Seq[(String, Seq[Double])] =
      ns.map { n =>
        spark.stop()
        System.gc()
        spark = makeSession()
        SparkEntry.prepare.get(n).foreach(_(spark, runDir))
        runOne(n) // warmup: session file-index + codegen, untimed
        n -> Seq(runOne(n), runOne(n), runOne(n)).filter(_ >= 0).sorted
      }
    val longResults = runLongPass(longQ)

    // ---- multi-window headline protocol (r14 prescription #1): single-
    // window ratios at sub-second absolutes carry ±60% (r14 measured the
    // headline geomean swinging 1.48×↔2.39× on identical code, driven by
    // DuckDB host drift), so the artifact itself records ≥2 same-session
    // windows for the headline set, each with BOTH engines' full sample
    // arrays; the quoted ratio becomes the cross-window band. Window 1 =
    // the run of record's long-entry pass + a DuckDB pass immediately
    // after; window 2 = a second full Spark+DuckDB pass at the end of
    // the bench. DuckDB times via tools/duck_time.py (driver-side python
    // + duckdb — measurement harness only, not a library dependency);
    // when that tool or its interpreter is absent the window records an
    // empty duckdb map rather than failing the bench.
    val headline = Seq("q75_scale100_pricing", "q79_scale100_fixedpoint",
      "q83_scale100_rollup", "q87_scale100_join", "q94_bucketed_join",
      "q100_spandedup_scale10", "q115_dsir_scale10", "q117_dsir_scale100")
      .filter(names.contains)
    def duckTime(ns: Seq[String]): Seq[(String, Seq[Double])] =
      if (ns.isEmpty) Seq.empty
      else try {
        def esc(s: String): String = "\"" + s.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
        val sqlJson = ns.flatMap(n => SparkEntry.oracleSql.get(n)
            .map(sql => s"${esc(n)}: ${esc(sql)}"))
          .mkString("{", ",", "}")
        val f = Files.createTempFile("graft_duck_sql", ".json")
        Files.writeString(f, sqlJson)
        val pb = new ProcessBuilder("python3", "tools/duck_time.py",
          runDir, f.toString, "3")
        // stderr INHERITed, not left on an undrained pipe: duck_time.py
        // prints a full DuckDB error per failing oracle, and a filled
        // ~64KB pipe buffer would block the child (and this bench) while
        // silently discarding the diagnostics
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
        proc.waitFor()
        out.linesIterator.flatMap { line =>
          line.split("\\s+").toList match {
            case name :: ts if ts.nonEmpty &&
                ts.forall(_.matches("[0-9.]+")) =>
              Some(name -> ts.map(_.toDouble).sorted.toSeq)
            case _ => None
          }
        }.toSeq
      } catch { case e: Throwable =>
        System.err.println(s"[bench] duckdb window skipped: ${e.getMessage}")
        Seq.empty
      }
    def windowJson(sp: Seq[(String, Seq[Double])],
        du: Seq[(String, Seq[Double])]): String = {
      def m(rs: Seq[(String, Seq[Double])]): String = rs.map { case (k, ts) =>
        "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      s"""{"spark":${m(sp)},"duckdb":${m(du)}}"""
    }
    val window1 = windowJson(
      longResults.filter(r => headline.contains(r._1)), duckTime(headline))
    // Maintenance (write-side) entries: absolute seconds, min of two
    // passes, each pass on a FRESH fixture (untimed build) so the timed
    // thunk is pure maintenance work. READ-ONLY headline twins are the
    // exception: their fixtures are stable parquet, so the no-warmup
    // protocol charges them session one-offs (footer listing, codegen,
    // broadcast build) that are not the query's cost — r14 measured the
    // same m_q87_mat work at 0.99 s warm (MatScanProfile) vs 1.37–1.57
    // under the cold min-of-2; these get one untimed warmup + min-of-3
    // on the SAME thunk, matching the DuckDB twin's warm protocol.
    val warmReadEntries = Set("m_q75_mat", "m_q87_mat", "m_q94_mat",
      "m_asof_plain_uniform_x10", "m_asof_buck_uniform_x10",
      "m_asof_plain_x1000", "m_asof_merge_x1000")
    val maintResults = (graft.bench.MaintenanceBench.entries ++
        graft.bench.ScaleBench.entries)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, mk) =>
        val ts =
          if (graft.bench.ScaleBench.freshNames(name)) {
            // decade class: fresh SparkContext (the tens-of-seconds graph/
            // event passes both suffer and cause late-session pressure),
            // fixture build untimed inside mk, ONE untimed warmup (the
            // sub-3 s decade entries otherwise charge fresh-session
            // one-offs — file listing, first-touch codegen — that their
            // warm DuckDB twins don't pay; r15 measured m_funnel_x100
            // reading 2.7 s cold vs a 0.24 s twin), then min-of-2
            spark.stop()
            System.gc()
            spark = makeSession()
            try {
              val thunk = mk(spark, runDir)
              thunk() // warmup, untimed
              (1 to 2).map { _ =>
                val t0 = System.nanoTime()
                thunk()
                (System.nanoTime() - t0) / 1e9
              }
            } catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              Seq.empty[Double]
            }
          } else if (warmReadEntries(name)) {
            try {
              val thunk = mk(spark, runDir)
              // THREE untimed warmups, not one: the r14 "0.18 s residual"
              // between this thunk and MatScanProfile's reading of the
              // same work was isolated this round to JIT compile depth —
              // in a fresh JVM the q87-shaped pass reads ~2.0 s and the
              // SAME work settles to ~1.31 s after several passes
              // (2026-08-16, same-window pair at identical batch/file
              // config; relayout-writeback was tested and refuted with
              // SPARK_GRAFT_RELAYOUT=false), so min-of-3 after one
              // warmup sits on the early compile curve, not the steady
              // state. Steady state is the honest claim for a long-lived
              // production executor JVM — and the DuckDB twin (C++, no
              // compile curve) is at ITS steady state after one pass.
              (1 to 3).foreach(_ => thunk())
              (1 to 3).map { _ =>
                val t0 = System.nanoTime()
                thunk()
                (System.nanoTime() - t0) / 1e9
              }
            } catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              Seq.empty[Double]
            }
          } else (1 to 2).flatMap { _ =>
            try {
              val thunk = mk(spark, runDir)
              val t0 = System.nanoTime()
              thunk()
              Some((System.nanoTime() - t0) / 1e9)
            } catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              None
            }
          }
        name -> ts.sorted.toSeq
      }
    // Paired A/B entries: the comparison IS the claim, so one invocation
    // times both sides strictly interleaved (ScaleBench.abSamples3) and
    // reports each side's min — a host-variance patch cannot land on one
    // whole side's sequential block the way the per-entry loop allows.
    // Each pair runs in a FRESH session (the long-entry protocol): these
    // are the last tens-of-seconds entries in a 100+-entry JVM, and r12's
    // run of record put one side 2× over the builder's same-protocol
    // recordings — consistent with late-session heap/GC pressure the
    // interleaving alone cannot control for.
    val pairedResults = graft.bench.ScaleBench.pairedEntries
      .filter { case ((a, b), _) =>
        only.forall(o => o.contains(a) || o.contains(b)) }
      .flatMap { case ((na, nb), mk) =>
        spark.stop()
        System.gc()
        spark = makeSession()
        try {
          val (ta, tb) = mk(spark, runDir)()
          Seq(na -> ta.sorted.toSeq, nb -> tb.sorted.toSeq)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $na/$nb failed: ${e.getMessage}")
          Seq(na -> Seq.empty[Double], nb -> Seq.empty[Double])
        }
      }
    // window 2: a second full Spark pass over the headline set (same
    // fresh-session protocol) + its paired DuckDB pass, minutes after
    // window 1 in the same invocation — the in-artifact drift band.
    val window2 = windowJson(runLongPass(headline), duckTime(headline))

    val results: Seq[(String, Seq[Double])] =
      shortResults ++ longResults ++ maintResults ++ pairedResults
    val qs = results.map { case (k, ts) =>
      val v = if (ts.isEmpty) -1.0 else ts.min
      "\"" + k + "\":" + f"$v%.3f"
    }.mkString("{", ",", "}")
    val samples = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2.minOption).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"samples":$samples,"windows":[$window1,$window2],"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    // Flush logs first so the JSON line lands clean and last on stdout.
    System.err.flush(); System.out.flush()
    println(json)
    spark.stop()
  }
}
