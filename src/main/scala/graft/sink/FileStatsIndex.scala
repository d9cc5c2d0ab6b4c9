package graft.sink

import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
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

  private def cmp(a: String, b: String): Int = ColStats.cmp(kind, a, b)

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

object ColStats {
  /** Kind-directed value order over the rendered strings — shared by the
    * read-side pruning predicate and the write-side footer fold. */
  private[sink] def cmp(kind: String, a: String, b: String): Int = kind match {
    case "i" => BigInt(a).compare(BigInt(b))
    case "f" =>
      // primitive compare: ±0.0 are EQUAL (parquet canonicalizes a zero
      // min to -0.0 / zero max to +0.0; the two producers and the pruning
      // predicate must agree that the zeros are the same value)
      val (x, y) = (a.toDouble, b.toDouble)
      if (x < y) -1 else if (x > y) 1 else 0
    case "d" => BigDecimal(a).compare(BigDecimal(b))
    case _   => a.compareTo(b)
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
  * Write side: the min/max/null-count/row-count numbers are HARVESTED FROM
  * THE PARQUET FOOTERS of the just-written version dir — O(files) metadata
  * reads, zero data re-read (the parquet writer already computed exactly
  * these statistics while writing). The key Bloom filter is the one thing
  * footers don't carry, so when Bloom indexing is on, ONE narrow
  * aggregation pass over just the key columns builds it (grouped by
  * `input_file_name`, a single scan regardless of file count, reading only
  * the key columns of data that is still hot). A statsCol whose type the
  * footer harvest can't render identically (e.g. timestamps, whose footer
  * form is raw micros) falls back to the equivalent full aggregation scan
  * — same sidecar bytes, different producer ([[FileStatsIndexSpec]] pins
  * the byte-identity). Sidecars land as `_stats/<v>.json` BEFORE the
  * manifest commit — a committed manifest therefore always has its index,
  * and an orphan sidecar from a crashed attempt is simply overwritten on
  * retry.
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
    // canonical zero: parquet footer stats normalize a zero min to -0.0
    // and a zero max to +0.0 (conservative for either sign); render both
    // as "0.0" so the two producers emit identical bytes
    case f: java.lang.Float if f.floatValue() == 0f   => "0.0"
    case d: java.lang.Double if d.doubleValue() == 0d => "0.0"
    case other                     => other.toString
  }

  private def sidecarPath(tablePath: String, v: Int) =
    Paths.get(tablePath, "_stats", f"$v%08d.json")

  /** Index every data file under `data/<version>` and write the sidecar.
    * `statsCols` must be data (non-partition) columns; partition pruning
    * already covers the rest. Producer choice: parquet-footer harvest
    * (O(files) metadata, no data re-read) when every statsCol is
    * footer-renderable, else the aggregation scan; the key Bloom (if on)
    * always comes from a narrow key-columns-only scan. */
  def writeSidecar(spark: SparkSession, tablePath: String, version: Int,
      statsCols: Seq[String], keyCols: Seq[String], bloomBits: Int): Unit = {
    val dataDir = s"$tablePath/data/$version"
    // footerStats itself returns None for any statsCol type it can't
    // render identically (and for absent/truncated footer stats) — the
    // scan producer is the universal fallback
    val files = footerStats(spark, tablePath, dataDir, statsCols) match {
      case Some(fs) =>
        withBlooms(spark, tablePath, dataDir, fs, keyCols, bloomBits)
      case None =>
        scanStats(spark, tablePath, dataDir, statsCols, keyCols, bloomBits)
    }

    val out = sidecarPath(tablePath, version)
    JFiles.createDirectories(out.getParent)
    val tmp = out.getParent.resolve(f".$version%08d.json.tmp")
    JFiles.writeString(tmp, Serialization.writePretty(
      StatsSidecar(version, bloomBits, DefaultBloomK, files)))
    JFiles.move(tmp, out, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def relativize(tablePath: String, abs: String): String = {
    val root = Paths.get(tablePath).toAbsolutePath
    root.relativize(Paths.get(abs)).toString
  }

  /** O(files) metadata producer: every number from the parquet footers the
    * writer already computed. Returns None if ANY required statistic is
    * missing from a footer (e.g. truncated/omitted binary stats) — the
    * caller then falls back to the scan producer, keeping the
    * conservative contract. */
  private[sink] def footerStats(spark: SparkSession, tablePath: String,
      dataDir: String, statsCols: Seq[String])
      : Option[Map[String, FileStats]] = {
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = Paths.get(dataDir)
    val parts = {
      val s = JFiles.walk(dirPath)
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (JFiles.isRegularFile(p) && !n.startsWith("_") &&
              !n.startsWith(".") && n.endsWith(".parquet"))
            buf += p
        }
        buf.toSeq
      } finally s.close()
    }
    val out = Map.newBuilder[String, FileStats]
    for (p <- parts) {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(p.toUri), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.iterator.map(_.getRowCount).sum
        val msgType = reader.getFooter.getFileMetaData.getSchema
        val cols = statsCols.map { c =>
          var mn: String = null
          var mx: String = null
          var nulls = 0L
          for (b <- blocks) {
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(return None) // column absent from this file
            val st = chunk.getStatistics
            if (st == null || st.isEmpty || !st.isNumNullsSet) return None
            nulls += st.getNumNulls
            if (st.hasNonNullValue) {
              val kind = kindFromParquet(msgType, c).getOrElse(return None)
              val (cmn, cmx) = renderFooterMinMax(msgType, c, st)
              if (cmn == null || cmx == null) return None
              if (mn == null || ColStats.cmp(kind, cmn, mn) < 0) mn = cmn
              if (mx == null || ColStats.cmp(kind, cmx, mx) > 0) mx = cmx
            }
          }
          c -> ColStats(kindFromParquet(msgType, c).getOrElse(return None),
            Option(mn), Option(mx), nulls)
        }.toMap
        out += relativize(tablePath, p.toAbsolutePath.toString) ->
          FileStats(rows, cols, None)
      } finally reader.close()
    }
    Some(out.result())
  }

  /** The [[ColStats]] `kind` of a top-level parquet column, from the
    * parquet primitive + logical annotation — the same classification
    * [[kindOf]] makes from the Spark type. */
  private def kindFromParquet(schema: org.apache.parquet.schema.MessageType,
      c: String): Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val t = schema.getType(Seq(c): _*)
    if (!t.isPrimitive) return None
    val f = t.asPrimitiveType()
    f.getLogicalTypeAnnotation match {
      case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some("d")
      case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation  => Some("s")
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if i.isSigned => Some("i")
      case null => f.getPrimitiveTypeName match {
        case INT32 | INT64  => Some("i")
        case FLOAT | DOUBLE => Some("f")
        case _ => None // INT96, BOOLEAN, plain BINARY/FIXED: scan fallback
      }
      // TIMESTAMP/DATE/TIME/UUID/... — footer form (raw micros/days) is
      // not the scan's rendering; fall back
      case _ => None
    }
  }

  /** Footer min/max rendered to the scan producer's exact strings, or
    * (null, null) when this chunk's form can't be rendered identically. */
  private def renderFooterMinMax(
      schema: org.apache.parquet.schema.MessageType, c: String,
      st: org.apache.parquet.column.statistics.Statistics[_])
      : (String, String) = {
    val f = schema.getType(Seq(c): _*).asPrimitiveType()
    f.getLogicalTypeAnnotation match {
      case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
        def dec(v: Any): String = {
          val unscaled = v match {
            case i: java.lang.Integer => BigInt(i.toLong)
            case l: java.lang.Long    => BigInt(l.longValue())
            case b: org.apache.parquet.io.api.Binary =>
              BigInt(new java.math.BigInteger(b.getBytes))
            case other => throw new IllegalStateException(
              s"unexpected decimal physical value $other")
          }
          new java.math.BigDecimal(unscaled.bigInteger, d.getScale)
            .toPlainString
        }
        (dec(st.genericGetMin), dec(st.genericGetMax))
      case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
        (st.genericGetMin, st.genericGetMax) match {
          case (a: org.apache.parquet.io.api.Binary,
                b: org.apache.parquet.io.api.Binary) =>
            (a.toStringUsingUTF8, b.toStringUsingUTF8)
          case _ => (null, null)
        }
      case _ =>
        // int/long/float/double: JVM toString == the scan's render (both
        // through `render`, which canonicalizes ±0.0)
        (render(st.genericGetMin), render(st.genericGetMax))
    }
  }

  /** Narrow Bloom pass: one grouped aggregation over ONLY the key columns
    * (projection pruning keeps the scan to those columns' pages), merged
    * into the footer-harvested entries. The file sets must agree — a
    * mismatch means the dir changed under us, which violates the
    * immutable-file contract, so it fails loudly. */
  private[sink] def withBlooms(spark: SparkSession, tablePath: String,
      dataDir: String, base: Map[String, FileStats], keyCols: Seq[String],
      bloomBits: Int): Map[String, FileStats] = {
    if (bloomBits <= 0) return base
    val df = spark.read.option("basePath", dataDir).parquet(dataDir)
    val rows = df
      .select(xxhash64(concat_ws("\u0000",
        keyCols.map(c => col(c).cast("string")): _*)).as("__h"),
        input_file_name().as("__file"))
      .groupBy(col("__file"))
      .agg(BloomAgg.column(col("__h"), bloomBits, DefaultBloomK).as("__bloom"))
      .collect()
    val blooms = rows.map { (r: Row) =>
      relativize(tablePath,
        Paths.get(new java.net.URI(r.getAs[String]("__file")).getPath)
          .toString) ->
        Base64.getEncoder.encodeToString(r.getAs[Array[Byte]]("__bloom"))
    }.toMap
    require(blooms.keySet == base.keySet,
      s"FileStatsIndex($dataDir): bloom pass saw files ${blooms.keySet} " +
        s"but footers saw ${base.keySet} — immutable-file contract violated")
    base.map { case (f, fs) => f -> fs.copy(bloom = Some(blooms(f))) }
  }

  /** The full-aggregation producer (round 8's write path): one scan of the
    * version dir grouped by `input_file_name`. Kept as the fallback for
    * statsCol types the footer harvest can't render identically, and as
    * the reference producer [[FileStatsIndexSpec]] compares against. */
  private[sink] def scanStats(spark: SparkSession, tablePath: String,
      dataDir: String, statsCols: Seq[String], keyCols: Seq[String],
      bloomBits: Int): Map[String, FileStats] = {
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

    rows.map { (r: Row) =>
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
      relativize(tablePath,
        Paths.get(new java.net.URI(r.getAs[String]("__file")).getPath)
          .toString) -> FileStats(r.getAs[Long]("__rows"), cols, bloom)
    }.toMap
  }

  /** Convenience `keepFile` predicate: keep files whose `[min, max]` for
    * `column` intersects `[lo, hi]` — files with no stats (or no entry
    * for the column) are kept, per the conservative contract. */
  def range(column: String, lo: Option[Any], hi: Option[Any])
      : FileStats => Boolean =
    fs => fs.cols.get(column).forall(_.overlaps(lo, hi))

  /** Row count of one parquet file from its FOOTER alone — zero data
    * pages read. For cheap regime decisions (e.g. the sig registry's
    * adaptive candidate semi-filter), never correctness. */
  private[sink] def footerRowCount(spark: SparkSession,
      absolutePath: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(absolutePath), conf))
    try reader.getFooter.getBlocks.asScala.iterator.map(_.getRowCount).sum
    finally reader.close()
  }

  /** The sidecar for files written at `version`, if that commit was
    * indexed (tables can turn stats on mid-life; older versions simply
    * never prune). */
  def readSidecar(tablePath: String, version: Int): Option[StatsSidecar] = {
    val p = sidecarPath(tablePath, version)
    if (!JFiles.exists(p)) None
    else Some(JsonMethods.parse(JFiles.readString(p)).extract[StatsSidecar])
  }
}
