package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO allocation — match a demand stream against a supply stream in
  * arrival order (inventory consumption, lot/cost-basis matching, queue
  * fairness audits) — WITHOUT any sequential scan: on the per-key
  * cumulative-quantity axis, supply row i occupies the half-open
  * interval [Σqty(<i), Σqty(≤i)) and demand row j likewise; FIFO says
  * demand j consumes exactly the supply rows whose intervals OVERLAP
  * its own, and the matched quantity is the intersection length. Two
  * prefix-sum windows + one bucketed interval-overlap equi-join replace
  * the textbook row-at-a-time allocator, so the operator distributes:
  * every shuffle is on (key, bucket), per-key work is independent, and
  * each qualifying pair is CLAIMED in the bucket where the intersection
  * starts (the q73 claim trick) — emitted exactly once, no dedup pass.
  *
  * Contract: both inputs carry exactly (key, ord, id, qty) — `ord`
  * the FIFO arrival order, ties broken by `id`; the PAIR (ord, id)
  * must be unique per key (a duplicate pair would make the prefix sums
  * order-dependent), and `qty` is a positive long. `id` alone may
  * repeat — each row is still its own lot, though consumers reading
  * the output per id will see those lots merged. Demand beyond the
  * key's total supply is simply unmatched (absent from the output);
  * callers audit shortfall by comparing matched sums against demand
  * totals.
  */
object Fifo {

  def allocate(supply: DataFrame, demand: DataFrame,
               bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive: $bucketSize")
    val w = Window.partitionBy("key").orderBy("ord", "id")
      .rowsBetween(Window.unboundedPreceding, 0)
    def cum(df: DataFrame, p: String): DataFrame = df
      .withColumn(s"${p}_end", sum(col("qty")).over(w))
      .withColumn(s"${p}_start", col(s"${p}_end") - col("qty"))
      .select(col("key"), col("ord").as(s"${p}_ord"), col("id").as(s"${p}_id"),
        col(s"${p}_start"), col(s"${p}_end"))
    val s = cum(supply, "s")
      .withColumn("__b", explode(sequence(
        expr(s"s_start div $bucketSize"), expr(s"(s_end - 1) div $bucketSize"))))
    val d = cum(demand, "d")
      .withColumn("__b", explode(sequence(
        expr(s"d_start div $bucketSize"), expr(s"(d_end - 1) div $bucketSize"))))
    s.join(d, Seq("key", "__b"))
      .filter(col("s_start") < col("d_end") && col("d_start") < col("s_end"))
      // claim in the bucket where the intersection begins: exactly one
      // of the co-occurring buckets, so each pair survives once
      .filter(col("__b") ===
        expr(s"greatest(s_start, d_start) div $bucketSize"))
      .select(col("key"), col("s_id"), col("d_id"),
        col("s_ord"), col("d_ord"),
        (least(col("s_end"), col("d_end"))
          - greatest(col("s_start"), col("d_start"))).as("matched_qty"))
  }
}
