package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands over per-key interval sets: the classic "saturation
  * windows" operator — for each key, the maximal time spans where the
  * number of concurrently open intervals exceeds the key's own average
  * concurrency.
  *
  * Reference analog: the load/engagement reporting layer a warehouse
  * builds over validity intervals (the reference's SCD2 `__START_AT`/
  * `__END_AT` columns are exactly such an interval set per business key —
  * local_spotify_dab/src/gold/spotify_etl/transformations/DimArtist.py).
  *
  * Shape: interval → two boundary rows (+1 at start, −1 past end), one
  * shuffle on the key, a per-key sort (window) producing the running
  * concurrency via prefix sum, segments between consecutive boundaries,
  * and a second per-key running sum merging adjacent qualifying segments
  * into islands. Everything is integer arithmetic on day numbers —
  * bit-exact under any partitioning — and the threshold comparison
  * `cnt · span > Σdur` is kept in integers (never a float average).
  *
  * Scale: all windows hash-partition by the key, so the operator
  * distributes across keys; a single key's boundary list is 2× its
  * interval count. For a GLOBAL island sweep (one key), the running sums
  * decompose over `PrefixSum.runningSum` with a time-bucket — the q71/q72
  * machinery — at the cost of a bucket-boundary stitch for lead/lag.
  */
object Intervals {

  /** Per-key islands where open-interval concurrency exceeds the key's
    * average. `stCol`/`enCol` are INCLUSIVE integer day (or any unit)
    * bounds with `st <= en`. Returns one row per (key, island_seq) with
    * `island_start`/`island_end` (inclusive), `n_days`, `peak_open`.
    *
    * Tie handling: boundaries sort by (ts, delta), so −1 rows at a day
    * precede +1 rows — the concurrency read at a day is the end-of-day
    * value, and only the LAST boundary row of each distinct ts survives
    * into the segment frame (its `lead` is the next distinct ts), making
    * the running sum deterministic under the ROWS frame even with
    * duplicate (ts, delta) rows.
    */
  def thresholdIslands(iv: DataFrame, keyCol: String, stCol: String,
                       enCol: String): DataFrame = {
    val k = col(keyCol)
    val tot = iv.groupBy(k).agg(
      sum(col(enCol) - col(stCol) + lit(1L)).as("__dur"),
      min(col(stCol)).as("__lo"),
      max(col(enCol)).as("__hi"))
    val bounds = iv.select(k, col(stCol).cast("long").as("__ts"), lit(1L).as("__delta"))
      .unionAll(iv.select(k, (col(enCol) + lit(1)).cast("long").as("__ts"),
        lit(-1L).as("__delta")))
    val w = Window.partitionBy(k).orderBy(col("__ts"), col("__delta"))
    val run = bounds
      .withColumn("__cnt", sum(col("__delta"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__nxt", lead(col("__ts"), 1).over(w))
    // a segment [ts, nxt) carries constant concurrency __cnt; qualifying =
    // above the key's average concurrency, compared in exact integers
    val seg = run.join(tot, Seq(keyCol))
      .filter(col("__nxt").isNotNull && col("__nxt") > col("__ts") &&
        col("__cnt") * (col("__hi") - col("__lo") + lit(1L)) > col("__dur"))
    val ws = Window.partitionBy(k).orderBy(col("__ts"))
    val isl = seg
      .withColumn("__f",
        when(lag(col("__nxt"), 1).over(ws) === col("__ts"), 0L).otherwise(1L))
      .withColumn("island_seq", sum(col("__f"))
        .over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(k, col("island_seq"))
      .agg(
        min(col("__ts")).as("island_start"),
        (max(col("__nxt")) - lit(1L)).as("island_end"),
        (max(col("__nxt")) - min(col("__ts"))).as("n_days"),
        max(col("__cnt")).as("peak_open"))
  }
}
