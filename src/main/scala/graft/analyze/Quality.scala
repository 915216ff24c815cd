package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the declarative ingest contract
  * (Deequ/Great-Expectations shape) the reference approximates with
  * its ad-hoc sanity transforms (`data_sanity_helpers.py`): declare
  * what the table must satisfy, get one metadata-sized report row per
  * check, fail the pipeline on `passed = false` rows instead of
  * letting bad data flow downstream.
  */
object Quality {

  sealed trait Check { def name: String; def column: String }
  /** Null fraction of `column` must be ≤ maxNullPermille/1000 (integer
    * permille so the pass decision is an exact integer compare). */
  final case class NotNull(column: String, maxNullPermille: Int = 0)
      extends Check { val name = "not_null" }
  /** Every non-null value of `column` appears exactly once. */
  final case class Unique(column: String) extends Check { val name = "unique" }
  /** Every non-null numeric value within [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check { val name = "in_range" }
  /** Every non-null value within the allowed set. */
  final case class InSet(column: String, values: Seq[String])
      extends Check { val name = "in_set" }
  /** Table has at least `n` rows. */
  final case class MinRows(n: Long) extends Check {
    val name = "min_rows"; val column = "*"
  }

  /** Run every check in ONE aggregation pass (plus the count-distinct
    * expand `Unique` needs) and return a report:
    * `(check, column, observed, passed)` — `observed` is the VIOLATION
    * count (null rows, duplicate surplus, out-of-range rows,
    * out-of-set rows) except for `min_rows`, where it is the row
    * count. All metrics are exact integers; every pass decision is an
    * integer compare — nothing engine-fragile in a gate that decides
    * whether pipelines run.
    *
    * Scale shape: one partial-aggregating pass over the table
    * (`Unique` adds Spark's count-distinct expand on the checked
    * columns); the report is checks-cardinality, metadata-sized. */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "runChecks needs at least one check")
    val n = count(lit(1))
    val metrics: Seq[Column] = n.as("__n") +: checks.zipWithIndex.map {
      case (NotNull(c, _), i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__m$i")
      case (Unique(c), i) =>
        (count(col(c)) - countDistinct(col(c))).as(s"__m$i")
      case (InRange(c, lo, hi), i) =>
        sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L)).as(s"__m$i")
      case (InSet(c, vs), i) =>
        sum(when(col(c).isNotNull &&
          !col(c).isin(vs.map(v => v: Any): _*), 1L).otherwise(0L))
          .as(s"__m$i")
      case (MinRows(_), i) => n.as(s"__m$i")
    }
    val agg = df.agg(metrics.head, metrics.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"__m$i")
      val passed = c match {
        case NotNull(_, permille) => m * 1000 <= lit(permille) * col("__n")
        case MinRows(min)         => m >= min
        case _                    => m === 0L
      }
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        m.as("observed"), passed.as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.column"), col("r.observed"),
        col("r.passed"))
  }
}
