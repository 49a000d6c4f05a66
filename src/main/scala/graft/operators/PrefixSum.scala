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
                 weight: Column, cumCol: String): DataFrame = {
    val w = Window.partitionBy(col(bucketCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__graft_local", sum(weight).over(w))
    // exclusive prefix of bucket totals: one row per bucket, so the
    // unpartitioned window is a deliberately tiny single task
    val prefix = df.groupBy(col(bucketCol)).agg(sum(weight).as("__graft_btot"))
      .withColumn("__graft_prefix",
        coalesce(sum(col("__graft_btot"))
          .over(Window.orderBy(col(bucketCol)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(bucketCol), col("__graft_prefix"))
    local.join(broadcast(prefix), Seq(bucketCol))
      .withColumn(cumCol, col("__graft_local") + col("__graft_prefix"))
      .drop("__graft_local", "__graft_prefix")
  }
}
