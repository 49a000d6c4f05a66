package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, expr}

/** Stream-stream event-time interval join.
  *
  * Both sides are watermarked and the join condition carries an explicit
  * event-time interval, which is what lets Spark bound the join state:
  * each side buffers only rows inside (watermark - lookback), so state is
  * O(rate × lookback) regardless of stream age — the only join shape
  * that survives an unbounded 100 TB/day stream pair. The reference's
  * stream-to-stream correlation (play events vs user actions) is this
  * operator.
  */
object StreamJoin {

  /** Inner-join `left` and `right` on equal `keys`, keeping pairs where
    * `rightTs` falls within [leftTs - lookback, leftTs]. Column names of
    * the two timestamp columns must differ.
    */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame,
                   rightTs: String, keys: Seq[String], delay: String,
                   lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    // Same rename-keys-before-join/drop-by-name pattern as the outer
    // variants below. For an INNER join the old drop(r(k)) form was
    // value-correct (both sides' keys are equal on every surviving row),
    // but it resolved to the LEFT attribute and kept the right's — the
    // exact pattern that, copy-pasted into the left-outer variant, ate
    // every unmatched row (q263's gate caught it). One shape for all
    // three joins so the trap can't be re-introduced by imitation.
    val r = keys.foldLeft(right.withWatermark(rightTs, delay))(
      (d, k) => d.withColumnRenamed(k, s"__r_$k"))
    val keyCond = keys.map(k => l(k) === r(s"__r_$k")).reduce(_ && _)
    val timeCond =
      expr(s"$rightTs >= $leftTs - INTERVAL $lookback AND $rightTs <= $leftTs")
    keys.foldLeft(l.join(r, keyCond && timeCond, "inner"))(
      (d, k) => d.drop(s"__r_$k"))
  }

  /** LEFT-OUTER variant: every left row emits — matched pairs as the
    * inner join, plus ONE null-right row for left rows with no match in
    * their interval. The semantics only become decidable when the
    * WATERMARK closes a left row's match window (no future right row
    * can land in [leftTs − lookback, leftTs] once wm > leftTs), so the
    * null-match rows emit with watermark latency — that is the honest
    * cost of outer semantics on an unbounded stream, not an
    * implementation choice. Consequence for BOUNDED fixtures: the
    * stream must carry events advancing the watermark beyond the last
    * real row (the caller plants a non-joining sentinel and filters it
    * from the result) or the final rows' outer verdicts never emit; on
    * a production stream the next day's data does this for free. State
    * stays O(rate × lookback), as for the inner join — eviction and
    * outer emission ride the same watermark.
    */
  def intervalLeftJoin(left: DataFrame, leftTs: String, right: DataFrame,
                       rightTs: String, keys: Seq[String], delay: String,
                       lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    // rename the right keys BEFORE the join and drop them BY NAME after:
    // the attribute-reference drop(r(k)) form resolved to the LEFT
    // column here, silently keeping the right's — which is NULL on
    // every unmatched row, so a downstream key filter ate exactly the
    // outer rows this join exists to produce (the inner join never
    // notices: both sides' keys are equal there). Found by the q263
    // gate reading 33 rows against the oracle's 1981.
    val r = keys.foldLeft(right.withWatermark(rightTs, delay))(
      (d, k) => d.withColumnRenamed(k, s"__r_$k"))
    val keyCond = keys.map(k => l(k) === r(s"__r_$k")).reduce(_ && _)
    val timeCond =
      expr(s"$rightTs >= $leftTs - INTERVAL $lookback AND $rightTs <= $leftTs")
    keys.foldLeft(l.join(r, keyCond && timeCond, "leftOuter"))(
      (d, k) => d.drop(s"__r_$k"))
  }

  /** FULL-OUTER variant: matched pairs plus one null-right row per
    * unmatched left AND one null-left row per unmatched right. Both
    * sides' null verdicts ride the watermark (a right row is unmatched
    * only once wm > rightTs + lookback — no future left row's interval
    * can reach back to it), so both carry watermark latency; the
    * bounded-fixture sentinel contract is [[intervalLeftJoin]]'s. The
    * output key is COALESCE(left, right) — exactly one of them is
    * non-null on every row.
    */
  def intervalFullJoin(left: DataFrame, leftTs: String, right: DataFrame,
                       rightTs: String, keys: Seq[String], delay: String,
                       lookback: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = keys.foldLeft(right.withWatermark(rightTs, delay))(
      (d, k) => d.withColumnRenamed(k, s"__r_$k"))
    val keyCond = keys.map(k => l(k) === r(s"__r_$k")).reduce(_ && _)
    val timeCond =
      expr(s"$rightTs >= $leftTs - INTERVAL $lookback AND $rightTs <= $leftTs")
    val joined = l.join(r, keyCond && timeCond, "fullOuter")
    keys.foldLeft(joined)((d, k) =>
      d.withColumn(k, coalesce(col(k), col(s"__r_$k"))).drop(s"__r_$k"))
  }
}
