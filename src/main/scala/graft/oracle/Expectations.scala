package graft.oracle

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table, evaluated with the
  * minimum number of passes — the pre-publication gate a 100 TB corpus
  * release runs (and the reference's equivalent of its count/compare
  * sanity checks, `athena.py:81-86` + `compare_tables.py`, generalized).
  *
  * Scale shape: every ROW-LOCAL check (not-null, range, regex) compiles to
  * one conditional-sum aggregate, and ALL of them run in a SINGLE scan of
  * the table — adding a check adds a column to the aggregate, not a pass
  * over the data. A uniqueness check rides the same aggregate through
  * `count(*) − count(distinct key)` (one extra shuffle for the distinct,
  * unavoidable for exactness). Referential checks each add one
  * broadcast-anti pass (the dimension side of an FK is small by nature);
  * the fact side still streams map-side, nothing wide shuffles.
  *
  * Violation SEMANTICS are per-ROW: a null FK value is not a violation of
  * the reference check (null means "absent", checked by NotNull if
  * required) — mirrors SQL foreign-key semantics.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** Column must hold no nulls. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }

  /** `lo <= column <= hi` for every non-null value. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range($column)"
  }

  /** Every non-null value RLIKE-matches the regex (substring semantics —
    * anchor with `^...$` for a full match, which also keeps the check
    * portable to engines whose regex match is substring-based). */
  final case class MatchesRegex(column: String, regex: String) extends Check {
    val name = s"matches_regex($column)"
  }

  /** The column tuple is a unique key: violations = rows beyond the first
    * of each duplicated tuple (so a clean table reports 0). */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Foreign key: every non-null value must appear in `dim(dimColumn)`.
    * The dimension is broadcast — it must be dimension-sized. */
  final case class ReferencedIn(column: String, dim: DataFrame,
      dimColumn: String) extends Check {
    val name = s"referenced_in($column)"
  }

  private def violation(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0) < lit(lo) || col(col0) > lit(hi))
    case MatchesRegex(col0, re) =>
      col(col0).isNotNull && !regexp_like(col(col0), lit(re))
    case other => throw new IllegalArgumentException(
      s"${other.name} is not row-local") // Unique/ReferencedIn handled apart
  }

  /** Evaluate all checks. Returns one row per check:
    * `(check_name, n_violations, n_rows)`, ordered by name. Total cost:
    * one scan (+ one distinct shuffle if any Unique — several Unique
    * checks multiply that scan through Catalyst's Expand, so prefer one
    * composite key per run — + one broadcast-anti pass per ReferencedIn). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations: no checks given")
    require(checks.map(_.name).distinct.length == checks.length,
      "expectations: duplicate check names")
    val spark = df.sparkSession

    val rowLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: MatchesRegex) => c
    }
    val uniques = checks.collect { case c: Unique => c }
    val fks = checks.collect { case c: ReferencedIn => c }

    // single-scan aggregate: a conditional sum per row-local check, a
    // (count - distinct) pair per unique check, plus the row total
    val aggCols =
      rowLocal.map(c =>
        sum(when(violation(c), 1L).otherwise(0L)).as(c.name)) ++
      uniques.map(c =>
        (count(lit(1)) - count_distinct(struct(c.columns.map(col): _*)))
          .as(c.name)) :+
      count(lit(1)).as("__rows")
    val aggRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val nRows = aggRow.getAs[Long]("__rows")

    val scanned = (rowLocal ++ uniques).map(c =>
      (c.name, aggRow.getAs[Long](c.name)))

    // each FK: fact-side anti join against the broadcast dimension
    val fkCounts = fks.map { c =>
      val dimKeys = c.dim.select(col(c.dimColumn).as("__k")).distinct()
      val n = df.select(col(c.column).as("__k"))
        .filter(col("__k").isNotNull)
        .join(broadcast(dimKeys), Seq("__k"), "left_anti")
        .count()
      (c.name, n)
    }

    import spark.implicits._
    (scanned ++ fkCounts).toDF("check_name", "n_violations")
      .withColumn("n_rows", lit(nRows))
      .orderBy("check_name")
  }
}
