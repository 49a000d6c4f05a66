package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval×point range join without a cartesian product.
  *
  * Spark's optimizer turns a bare `a.start <= b.ts AND b.ts <= a.end`
  * join into BroadcastNestedLoopJoin (fine only when one side is tiny) or
  * a cartesian product (never fine). This operator makes the join an
  * EQUI-join by time-bucketing both sides: an interval explodes to every
  * fixed-width bucket it covers, a point belongs to exactly one bucket,
  * so every qualifying (interval, point) pair meets in exactly one bucket
  * — hash-partitionable, AQE-skew-splittable, and emitted exactly once
  * with no post-join dedup.
  *
  * Reference analog: the stream-activity overlap questions the reference's
  * gold layer serves from `FactStream` session windows
  * (gold_notebook.py: session/window aggregates) — answered there by a
  * warehouse inequality join, re-expressed here as the scale-safe
  * bucketed equi-join.
  *
  * Cost model: shuffle volume is |intervals| × (duration/bucketWidth + 1)
  * + |points|. Pick `bucketMicros` near the TYPICAL interval duration:
  * much smaller multiplies the interval side's explode factor; much
  * larger makes each bucket a mini cross product of co-bucketed rows.
  * Both degradations are linear and observable, never quadratic in the
  * table sizes. Timestamps are compared in integer epoch-micros so the
  * batch operator and a SQL oracle share exact arithmetic.
  */
object RangeJoin {

  /** Epoch-micros bucket index of `us` (floorDiv; exact for |us| < 2^53). */
  private def bucketOf(us: Column, bucketMicros: Long): Column =
    floor(us / lit(bucketMicros)).cast("long")

  /** Inner-join `intervals` to the `points` whose `tsCol` lies in
    * `[startCol, endCol]` (inclusive; all three are timestamp columns),
    * with `extraPred` applied inside the join (e.g. a not-same-key
    * predicate). Column names must be disjoint across the two inputs —
    * rename before calling; both sides' columns survive in the output.
    *
    * `saltShards` > 1 splits every time bucket into that many join keys —
    * each point lands in one shard (a deterministic hash of its
    * timestamp), each interval-bucket row replicates to all shards — so a
    * hot bucket (a flash-crowd hour) spreads over `saltShards` reducers
    * instead of pinning one. The emitted pair set is IDENTICAL (each pair
    * still meets exactly once: its point has exactly one shard); the cost
    * is the interval side's extra ×shards replication, so salt only when
    * the time distribution is known-spiky or AQE reports a straggler.
    */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String, tsCol: String,
                        bucketMicros: Long,
                        extraPred: Column = lit(true),
                        saltShards: Int = 1): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    require(saltShards >= 1, s"saltShards must be >= 1: $saltShards")
    val iv0 = intervals
      .withColumn("__graft_bucket",
        explode(sequence(
          bucketOf(unix_micros(col(startCol)), bucketMicros),
          bucketOf(unix_micros(col(endCol)), bucketMicros))))
    val pt0 = points
      .withColumn("__graft_bucket", bucketOf(unix_micros(col(tsCol)), bucketMicros))
    val (iv, pt) =
      if (saltShards == 1) (iv0.withColumn("__graft_salt", lit(0)),
        pt0.withColumn("__graft_salt", lit(0)))
      else (iv0.withColumn("__graft_salt",
          explode(array((0 until saltShards).map(lit): _*))),
        pt0.withColumn("__graft_salt",
          pmod(xxhash64(unix_micros(col(tsCol))), lit(saltShards)).cast("int")))
    iv.join(pt,
        iv("__graft_bucket") === pt("__graft_bucket") &&
          iv("__graft_salt") === pt("__graft_salt") &&
          unix_micros(col(tsCol)).between(
            unix_micros(col(startCol)), unix_micros(col(endCol))) &&
          extraPred)
      .drop("__graft_bucket").drop("__graft_salt")
  }

  /** Inner-join `left` to the `right` rows whose `[rStart, rEnd]` interval
    * OVERLAPS `[lStart, lEnd]` (inclusive endpoints; all four timestamp
    * columns). Both sides explode to their covered buckets; a qualifying
    * pair co-occurs in every bucket their intersection covers, so it is
    * CLAIMED only in the bucket of `max(lStart, rStart)` — the bucket
    * where the intersection begins — making each pair emitted exactly
    * once with no dedup pass. Column names must be disjoint.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucketMicros: Long,
                          extraPred: Column = lit(true)): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    def exploded(df: DataFrame, s: String, e: String) = df
      .withColumn("__graft_bucket",
        explode(sequence(
          bucketOf(unix_micros(col(s)), bucketMicros),
          bucketOf(unix_micros(col(e)), bucketMicros))))
    val l = exploded(left, lStart, lEnd)
    val r = exploded(right, rStart, rEnd)
    l.join(r,
        l("__graft_bucket") === r("__graft_bucket") &&
          unix_micros(col(lStart)) <= unix_micros(col(rEnd)) &&
          unix_micros(col(rStart)) <= unix_micros(col(lEnd)) &&
          l("__graft_bucket") === bucketOf(
            greatest(unix_micros(col(lStart)), unix_micros(col(rStart))), bucketMicros) &&
          extraPred)
      .drop("__graft_bucket")
  }
}
