package graft.oracle

import org.apache.spark.sql.{DataFrame, Row}

import graft.ops.LakeOps

/** Source-vs-lake equality oracle — the reference's continuous correctness
  * proof (`rds_to_datalake/compare.py:52-88`): equal counts, then row-level
  * equality, reporting the first few diffs.
  *
  * Spark-first shape: instead of the reference's driver-side sorted zip
  * (O(table) rows through the driver), the diff is two distributed
  * `exceptAll`s — each a shuffle bounded by table size, no driver
  * materialization beyond the sample. At 100 TB this is the only form that
  * runs at all.
  */
object CompareTables {

  final case class Diff(
      leftCount: Long, rightCount: Long,
      onlyLeftCount: Long, onlyRightCount: Long,
      sampleOnlyLeft: Seq[Row], sampleOnlyRight: Seq[Row]) {
    def isEqual: Boolean =
      leftCount == rightCount && onlyLeftCount == 0 && onlyRightCount == 0
  }

  /** Normalized compare: drops partition + meta columns from both sides
    * (`compare.py:38-48`), aligns column order, then set-diffs. */
  def compare(left: DataFrame, right: DataFrame, sample: Int = 10): Diff = {
    val l = LakeOps.normalizeForCompare(left)
    val cols = l.columns.toSeq
    val r = LakeOps.normalizeForCompare(right).select(cols.map(org.apache.spark.sql.functions.col): _*)
    val onlyL = l.exceptAll(r)
    val onlyR = r.exceptAll(l)
    Diff(l.count(), r.count(), onlyL.count(), onlyR.count(),
      onlyL.limit(sample).collect().toSeq, onlyR.limit(sample).collect().toSeq)
  }

  /** J3 — file-list reconciliation: set-diff of expected vs processed file
    * URIs (the reference's sorted-zip pipeline audit, `temp.py:25-46`).
    * Driver-side: these are file LISTS, bounded by file count. */
  final case class FileListDiff(missing: Seq[String], unexpected: Seq[String]) {
    def isReconciled: Boolean = missing.isEmpty && unexpected.isEmpty
  }

  def reconcileFileLists(expected: Seq[String], processed: Seq[String]): FileListDiff =
    FileListDiff(
      missing = (expected.toSet -- processed.toSet).toSeq.sorted,
      unexpected = (processed.toSet -- expected.toSet).toSeq.sorted)
}
