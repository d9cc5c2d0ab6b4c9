package graft.sink

import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.functions.BloomAgg

/** Column min/max/null stats for ONE file. `kind` fixes the comparison
  * semantics so sidecar JSON round-trips without type loss:
  * `i` integral (BigInt compare), `f` float/double (numeric compare),
  * `d` decimal (BigDecimal compare), `s` everything orderable as a string
  * (strings, ISO timestamps/dates — lexicographic IS chronological for
  * the zero-padded forms Spark prints). `min`/`max` are None when every
  * value in the file is null — such a file can never match a range. */
final case class ColStats(kind: String, min: Option[String],
    max: Option[String], nulls: Long) {

  private def cmp(a: String, b: String): Int = kind match {
    case "i" => BigInt(a).compare(BigInt(b))
    case "f" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "d" => BigDecimal(a).compare(BigDecimal(b))
    case _   => a.compareTo(b)
  }

  /** Could any row of this file fall in `[lo, hi]` (inclusive, either
    * bound optional)? The pruning contract: false ⇒ certainly no row
    * matches; true is always safe. */
  def overlaps(lo: Option[Any], hi: Option[Any]): Boolean = (min, max) match {
    case (Some(mn), Some(mx)) =>
      lo.forall(l => cmp(mx, l.toString) >= 0) &&
        hi.forall(h => cmp(mn, h.toString) <= 0)
    case _ => false // all-null column: no value can satisfy a range
  }
}

/** Per-file index entry: row count, per-column [[ColStats]], and an
  * optional key Bloom filter (base64 of the [[BloomAgg]] bit array). */
final case class FileStats(rows: Long, cols: Map[String, ColStats],
    bloom: Option[String] = None) {

  def mayContainHash(bloomBits: Int, bloomK: Int, hash: Long): Boolean =
    bloom.forall(b64 => BloomAgg.mayContain(
      Base64.getDecoder.decode(b64), bloomBits, bloomK, hash))
}

/** One sidecar = the index for every file WRITTEN at `version` (files are
  * immutable, so the index never needs rewriting — a snapshot referencing
  * files from many versions loads many sidecars, each O(files written
  * then)). */
final case class StatsSidecar(version: Int, bloomBits: Int, bloomK: Int,
    files: Map[String, FileStats])

/** File-level data skipping for [[VersionedLakeTable]] — the row-group-
  * statistics idea lifted to the table format's own metadata, where it
  * prunes BEFORE any file is opened (parquet footer stats still apply
  * inside the files that survive).
  *
  * Write side: one aggregation pass over the just-written version dir
  * (grouped by `input_file_name`, so it is a single scan regardless of
  * file count) computes min/max/nulls for the configured columns and a
  * per-file key Bloom filter, and lands them as `_stats/<v>.json` BEFORE
  * the manifest commit — a committed manifest therefore always has its
  * index, and an orphan sidecar from a crashed attempt is simply
  * overwritten on retry. The pass reads data that was just written (hot
  * in cache) and costs no more than the write itself; at true scale the
  * same numbers could be harvested from parquet footers in O(files)
  * metadata reads instead — same sidecar, different producer.
  *
  * Read side: [[VersionedLakeTable.readWhereStats]] consults the sidecars
  * of the version dirs its (partition-pruned) file list references —
  * O(referenced files) driver-side metadata — and drops every file whose
  * stats prove it irrelevant. With data clustered on the stats columns
  * (range partitioning, or the z-order layout of [[graft.ops.Layout]])
  * min/max ranges are disjoint across files and a point/range query
  * collapses to a handful of reads; the key Bloom gives the same collapse
  * for point lookups on UNclustered record keys (the Hudi bloom-index
  * role — `incremental.py` leans on exactly this to locate upsert
  * targets). A file with no index entry is always kept: stats are an
  * optimization, never a correctness gate.
  */
object FileStatsIndex {
  private implicit val formats: Formats = DefaultFormats
  val DefaultBloomK = 6

  /** Seed-42 xxhash64 of the NUL-joined stringified key — byte-identical
    * to the in-frame `xxhash64(concat_ws(NUL, keys.cast(string)))`
    * the write side aggregates, so driver-side probes and executor-side
    * builds can never disagree. */
  def keyHash(parts: Seq[Any]): Long = {
    val s = parts.map(String.valueOf).mkString("\u0000")
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
  }

  private def kindOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "i"
    case FloatType | DoubleType                        => "f"
    case _: DecimalType                                => "d"
    case _                                             => "s"
  }

  private def render(v: Any): String = v match {
    case null                      => null
    case d: java.math.BigDecimal   => d.toPlainString
    case other                     => other.toString
  }

  private def sidecarPath(tablePath: String, v: Int) =
    Paths.get(tablePath, "_stats", f"$v%08d.json")

  /** Index every data file under `data/<version>` and write the sidecar.
    * `statsCols` must be data (non-partition) columns; partition pruning
    * already covers the rest. */
  def writeSidecar(spark: SparkSession, tablePath: String, version: Int,
      statsCols: Seq[String], keyCols: Seq[String], bloomBits: Int): Unit = {
    val dataDir = s"$tablePath/data/$version"
    val df = spark.read.option("basePath", dataDir).parquet(dataDir)
    val kinds = statsCols.map(c => c -> kindOf(df.schema(c).dataType)).toMap

    val aggs =
      statsCols.flatMap(c => Seq(
        min(col(c)).as(s"__mn_$c"),
        max(col(c)).as(s"__mx_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nl_$c"))) ++
      (if (bloomBits > 0)
        Seq(BloomAgg.column(
          xxhash64(concat_ws("\u0000",
            keyCols.map(c => col(c).cast("string")): _*)),
          bloomBits, DefaultBloomK).as("__bloom"))
      else Nil)
    val rows = df.withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(count(lit(1)).as("__rows"), aggs: _*)
      .collect() // O(files written this commit) metadata rows

    val root = Paths.get(tablePath).toAbsolutePath
    def rel(uri: String): String =
      root.relativize(Paths.get(new java.net.URI(uri).getPath)).toString

    val files = rows.map { (r: Row) =>
      val cols = statsCols.map { c =>
        c -> ColStats(kinds(c),
          Option(render(r.getAs[Any](s"__mn_$c"))),
          Option(render(r.getAs[Any](s"__mx_$c"))),
          r.getAs[Long](s"__nl_$c"))
      }.toMap
      val bloom =
        if (bloomBits > 0)
          Some(Base64.getEncoder.encodeToString(r.getAs[Array[Byte]]("__bloom")))
        else None
      rel(r.getAs[String]("__file")) -> FileStats(
        r.getAs[Long]("__rows"), cols, bloom)
    }.toMap

    val out = sidecarPath(tablePath, version)
    JFiles.createDirectories(out.getParent)
    val tmp = out.getParent.resolve(f".$version%08d.json.tmp")
    JFiles.writeString(tmp, Serialization.writePretty(
      StatsSidecar(version, bloomBits, DefaultBloomK, files)))
    JFiles.move(tmp, out, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Convenience `keepFile` predicate: keep files whose `[min, max]` for
    * `column` intersects `[lo, hi]` — files with no stats (or no entry
    * for the column) are kept, per the conservative contract. */
  def range(column: String, lo: Option[Any], hi: Option[Any])
      : FileStats => Boolean =
    fs => fs.cols.get(column).forall(_.overlaps(lo, hi))

  /** The sidecar for files written at `version`, if that commit was
    * indexed (tables can turn stats on mid-life; older versions simply
    * never prune). */
  def readSidecar(tablePath: String, version: Int): Option[StatsSidecar] = {
    val p = sidecarPath(tablePath, version)
    if (!JFiles.exists(p)) None
    else Some(JsonMethods.parse(JFiles.readString(p)).extract[StatsSidecar])
  }
}
