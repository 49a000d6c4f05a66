package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL running sum — the prefix-sum primitive behind
  * order-statistics queries (count of rows before a boundary, global
  * running totals, rank-in-corpus) that per-key windows cannot express
  * and a bare `Window.orderBy` collapses to one task.
  *
  * Two-level cumsum over a caller-chosen DETERMINISTIC bucketing of the
  * global order (e.g. day-of-timestamp): a per-bucket window produces
  * local running sums in parallel, the per-bucket totals (one row per
  * bucket) get an exclusive prefix on a single tiny task, and a broadcast
  * join adds each bucket's offset back. Unlike `repartitionByRange` +
  * partition offsets, bucket boundaries are a pure function of the row —
  * no sampling, so no lineage pinning/checkpoint is needed and the result
  * is bit-deterministic across retries and cluster layouts.
  *
  * Scale contract: parallelism = bucket count, so choose a bucketing with
  * ≥ cores buckets and bounded per-bucket rows (calendar days/hours of a
  * timestamp are the usual choice). Bucket skew is data skew — visible,
  * and fixable by picking a finer bucket function.
  */
object PrefixSum {

  /** `df` + `cumCol`: running sum of `weight` over the global order
    * (`bucketCol` coarse, then `orderCols` within — the concatenation must
    * BE the intended global order, i.e. bucket is a monotone function of
    * `orderCols`), inclusive of the current row.
    */
  def runningSum(df: DataFrame, bucketCol: String, orderCols: Seq[Column],
                 weight: Column, cumCol: String): DataFrame =
    runningSums(df, bucketCol, orderCols, Seq(weight -> cumCol))

  /** Several running sums over ONE shared global order, paying the
    * per-bucket sort and the bucket-prefix pass once: the two-counts
    * queries (session overlap's startsUpTo/endsBefore) would otherwise
    * stack a second window + prefix join on top of the first.
    *
    * Weights may be ANY sign (a +1/-1 balance sweep is fine): bucket
    * totals are order-independent sums of the materialized weights, not
    * a max over the running column.
    */
  def runningSums(df: DataFrame, bucketCol: String, orderCols: Seq[Column],
                  weights: Seq[(Column, String)]): DataFrame = {
    val w = Window.partitionBy(col(bucketCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Materialize each weight once so the bucket-totals aggregate below
    // can sum the SAME column values the running sums consumed.
    val weighted = weights.zipWithIndex.foldLeft(df) { case (d, ((wt, _), i)) =>
      d.withColumn(s"__graft_w_$i", wt)
    }
    val local = weights.indices.foldLeft(weighted) { (d, i) =>
      d.withColumn(s"__graft_local_$i", sum(col(s"__graft_w_$i")).over(w))
    }
    // exclusive prefix of bucket totals: one row per bucket, so the
    // unpartitioned window is a deliberately tiny single task. Totals are
    // summed OFF the windowed frame — order-independent, so exact for
    // weights of ANY sign (a +1/-1 balance sweep included), unlike the
    // max-of-running-sum shortcut which silently assumed non-negative
    // counting weights. Aggregating over `local` keeps the totals subtree
    // rooted at the same windowed child as the join side's, so the
    // planner's exchange reuse shuffles the (possibly expensive) upstream
    // once instead of recomputing the whole lineage for a second
    // aggregate over `df`.
    val pw = Window.orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = local.groupBy(col(bucketCol)).agg(
      sum(col("__graft_w_0")).as("__graft_btot_0"),
      weights.indices.tail.map { i =>
        sum(col(s"__graft_w_$i")).as(s"__graft_btot_$i")
      }: _*)
    val prefix = weights.indices.foldLeft(totals) { (d, i) =>
      d.withColumn(s"__graft_prefix_$i",
        coalesce(sum(col(s"__graft_btot_$i")).over(pw), lit(0L)))
    }.select(col(bucketCol) +: weights.indices.map(i => col(s"__graft_prefix_$i")): _*)
    val joined = local.join(broadcast(prefix), Seq(bucketCol))
    weights.zipWithIndex.foldLeft(joined) { case (d, ((_, name), i)) =>
      d.withColumn(name, col(s"__graft_local_$i") + col(s"__graft_prefix_$i"))
        .drop(s"__graft_local_$i", s"__graft_prefix_$i", s"__graft_w_$i")
    }
  }
}
