package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the inter-event gap stays within `gapMicros`.
  *
  * Reference analog: stream/listen analytics over `FactStream`
  * (user listening sessions) — the standard behavioral-analytics operator
  * the reference's gold layer would build next.
  *
  * Shape: one shuffle on the key, one per-key sort (the window), then the
  * session id is a running sum of boundary flags — no self-joins, no
  * iteration. Gap comparison happens in integer epoch-micros so the batch
  * operator, the streaming variant, and the SQL oracle share exact
  * arithmetic.
  */
object Sessionize {

  /** Per-event session sequence number (1-based) for `keyCol`, ordered by
    * (`tsCol`, ties), with a new session when the gap exceeds `gapMicros`.
    */
  def sessionSeq(keyCol: String, tsCol: String, tieCols: Seq[String],
                 gapMicros: Long): Column = {
    val w = Window.partitionBy(col(keyCol)).orderBy((tsCol +: tieCols).map(col): _*)
    val gap = unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
    val boundary = when(gap > gapMicros, 1L).otherwise(0L)
    sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1L
  }

  /** Session-level aggregates: (key, session_seq, session_start,
    * session_end, n_events, total_value) where total_value is the exact
    * 2-dp sum of `valueCol` emitted as double.
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
               tieCols: Seq[String], valueCol: String, gapMicros: Long): DataFrame =
    df.withColumn("session_seq", sessionSeq(keyCol, tsCol, tieCols, gapMicros))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.Cols.moneySum(graft.Cols.dec2(col(valueCol))).as("total_value"))
}
