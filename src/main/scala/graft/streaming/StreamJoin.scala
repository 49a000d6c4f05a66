package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

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
    val r = right.withWatermark(rightTs, delay)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond =
      expr(s"$rightTs >= $leftTs - INTERVAL $lookback AND $rightTs <= $leftTs")
    keys.foldLeft(l.join(r, keyCond && timeCond, "inner"))((d, k) => d.drop(r(k)))
  }
}
