package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over an event-time stream.
  *
  * In append mode a window is emitted exactly once, when the watermark
  * passes its end — the streaming analog of the gold layer's grouped
  * reports. State per open window is one partial-aggregate row per
  * (window, key): map-side partial aggregation applies inside each
  * micro-batch, so the stateful shuffle carries combiner output, not raw
  * events — the property that keeps this viable at 100 TB/day.
  */
object WindowedAgg {

  /** Tumbling windows of `windowDur` with lateness tolerance `delay`,
    * grouped by `keys`, flattened to window_start/window_end columns.
    */
  def tumbling(stream: DataFrame, tsCol: String, windowDur: String,
               delay: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val agged = stream.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val rest = agged.columns.filterNot(_ == "window").map(col)
    agged.select(col("window.start").as("window_start") +:
      col("window.end").as("window_end") +: rest.toSeq: _*)
  }
}
