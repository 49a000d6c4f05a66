package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — rows not strictly dominated on a
  * (minimize x, minimize y) objective pair: r is dominated iff some q has
  * q.x ≤ r.x ∧ q.y ≤ r.y with at least one strict. The textbook
  * formulation is a quadratic NOT EXISTS self-join (exactly what the
  * oracle runs); at scale the 2-D case collapses to a sweep:
  *
  *   r is on the skyline  ⇔  r.y = min{y | x = r.x}           (best at its x)
  *                         ∧ r.y < min{y | x < r.x}           (beats all smaller x)
  *
  * which is one hash-aggregate to the per-x minima (O(distinct x) rows
  * per group), a running min over that ordered frame, and a join back —
  * O(n) total work and no pair materialization. With `partitionBy` keys
  * the whole computation (aggregate, sweep window, join) is partitioned
  * on the group key, so there is no unpartitioned window anywhere and
  * frontiers across groups parallelize perfectly.
  *
  * Ties: rows equal in BOTH dimensions don't dominate each other, so an
  * entire tie group at a frontier point is kept — the sweep's
  * `y = min-at-x` keeps every such row, matching the NOT EXISTS oracle.
  */
object Skyline {

  /** Frontier rows of `df` minimizing (`xCol`, `yCol`) within each
    * `partitionBy` group (global skyline when empty); all columns kept.
    */
  def pareto2d(df: DataFrame, xCol: String, yCol: String,
               partitionBy: Seq[String] = Nil): DataFrame = {
    val grpX = (partitionBy :+ xCol).map(col)
    val perX = df.groupBy(grpX: _*).agg(min(col(yCol)).as("__min_at_x"))
    val sweepW = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(xCol)).rowsBetween(Window.unboundedPreceding, -1)
    val sweep = perX.withColumn("__min_below_x", min(col("__min_at_x")).over(sweepW))
    // The sweep frame is one row per (group, distinct x) — broadcast when
    // that's small (the common case: bounded attribute domains).
    df.join(broadcast(sweep), partitionBy :+ xCol)
      .filter(col(yCol) === col("__min_at_x") &&
        (col("__min_below_x").isNull || col(yCol) < col("__min_below_x")))
      .drop("__min_at_x", "__min_below_x")
  }
}
