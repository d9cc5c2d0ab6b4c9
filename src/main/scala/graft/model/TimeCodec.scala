package graft.model

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Filename ↔ datetime codecs for the time-keyed CDC file stream.
  *
  * The CDC layer's only "index" is the lexicographic order of file keys:
  * `YYYY/MM/DD/HH/YYYYMMDD-HHMMSSfff.parquet`, where the name is the
  * commit-time upper bound of the rows inside (reference
  * `rds_to_datalake/incremental_load_orchestration.py:73-89`, contract
  * described in `DMS.rst:31-57`). Key-range listing over these names is the
  * file-level predicate pushdown that keeps incremental planning O(batch)
  * instead of O(table) — at 100 TB the planner never touches data files,
  * only names.
  */
object TimeCodec {

  private val keyFmt  = DateTimeFormatter.ofPattern("yyyy/MM/dd/HH/yyyyMMdd-HHmmssSSS")
  private val nameFmt = DateTimeFormatter.ofPattern("yyyyMMdd-HHmmssSSS")

  /** Epoch-microseconds → LocalDateTime (UTC) — the µs-long convention the
    * engine uses wherever nanosecond parquet timestamps are involved. */
  def fromMicros(us: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(
      java.lang.Math.floorDiv(us, 1000000L),
      java.lang.Math.floorMod(us, 1000000L).toInt * 1000,
      java.time.ZoneOffset.UTC)

  /** `datetime → "YYYY/MM/DD/HH/YYYYMMDD-HHMMSSfff"` (microseconds truncated
    * to milliseconds, matching the reference's `%f`[:-3] —
    * `incremental_load_orchestration.py:73-80`). */
  def datetimeToS3Key(dt: LocalDateTime): String = dt.format(keyFmt)

  /** Inverse of [[datetimeToS3Key]]'s final path segment
    * (`incremental_load_orchestration.py:83-89`). Accepts a bare filename
    * with or without the `.parquet` suffix or a full path. */
  def filenameToDatetime(fname: String): LocalDateTime = {
    val base = fname.substring(fname.lastIndexOf('/') + 1).stripSuffix(".parquet")
    LocalDateTime.parse(base, nameFmt)
  }

  /** Sequence-numbered batch-plan filename, reverse-lexicographic so the
    * *latest* plan lists first (`incremental_load_orchestration.py:288-301`):
    * two zero-padded 9-digit parts, `{1000000000-seq}-{seq}` — the first
    * part makes newest-first lexicographic listing work, the second makes
    * the sequence number directly readable. */
  def seqToFilename(seq: Long): String = {
    require(seq > 0 && seq < 1000000000L, s"seq out of range: $seq")
    f"${1000000000L - seq}%09d-$seq%09d"
  }

  /** Inverse of [[seqToFilename]]. Accepts a bare name with or without the
    * `.json` suffix or a full path; parses either part (they are redundant
    * by construction) and validates their consistency. */
  def filenameToSeq(name: String): Long = {
    val base = name.substring(name.lastIndexOf('/') + 1).stripSuffix(".json")
    base.split('-') match {
      case Array(inv, seq) =>
        val s = seq.toLong
        require(1000000000L - inv.toLong == s, s"inconsistent seq filename: $name")
        s
      case Array(inv) => 1000000000L - inv.toLong
      case _ => throw new IllegalArgumentException(s"bad seq filename: $name")
    }
  }
}
