package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic reporting operators beyond plain grouped aggregation: pivots,
  * share-of-total windows, and rolling time windows — the gold-layer
  * report shapes the reference's analytics notebooks produce.
  *
  * Determinism policy: every windowed SUM that feeds output runs over
  * exact decimals (order-independent) and converts to double only at the
  * edge — window partitions have no deterministic row order, so summing
  * doubles inside a window would be partitioning-dependent.
  */
object Analytics {

  /** Pivot `pivotCol` (with the explicit `values` domain — explicit so the
    * plan is static and scale-safe) into per-value count columns named
    * `<prefix><value>`. Missing combinations are 0, not null.
    */
  def pivotCounts(df: DataFrame, groupCol: String, pivotCol: String,
                  values: Seq[String], prefix: String): DataFrame = {
    val pivoted = df.groupBy(col(groupCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
    val renamed = values.foldLeft(pivoted)((d, v) =>
      d.withColumnRenamed(v, s"$prefix${v.toLowerCase}"))
    renamed.na.fill(0L, values.map(v => s"$prefix${v.toLowerCase}"))
  }

  /** Each group's share of its partition total. `valueCol` must be an
    * exact decimal column; the share is an IEEE division of the two
    * decimal-exact values cast to double.
    */
  def shareOfTotal(df: DataFrame, partitionCols: Seq[String],
                   valueCol: String): Column = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    col(valueCol).cast("double") / sum(col(valueCol)).over(w).cast("double")
  }

  /** Rolling sum over the trailing `days`-day window (inclusive of the
    * current day), keyed on a days-since-epoch column. Scale note: a
    * global time-ordered range window sorts one partition; at 100 TB,
    * partition by a coarse time bucket and stitch boundary days.
    */
  def rollingSumDays(dayNumCol: String, valueCol: String, days: Int): Column =
    sum(col(valueCol))
      .over(Window.orderBy(col(dayNumCol)).rangeBetween(-(days - 1), 0))
}
