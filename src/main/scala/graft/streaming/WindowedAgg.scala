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

  /** SLIDING windows (`windowDur` long, advancing every `slideDur`):
    * each event lands in windowDur/slideDur overlapping windows, so
    * state is that factor times tumbling's — still one partial row per
    * (window, key), bounded by the watermark exactly as tumbling is
    * (each window closes when the watermark passes ITS end, so at any
    * moment ~windowDur/slideDur window generations are open per key).
    * The streaming twin of q95's rolling-reach decomposition: the ×k
    * membership fan-out happens inside the window expression, and
    * map-side partial aggregation still means the stateful shuffle
    * carries combiner output, not events.
    */
  def sliding(stream: DataFrame, tsCol: String, windowDur: String,
              slideDur: String, delay: String, keys: Seq[String],
              aggs: Seq[Column]): DataFrame = {
    val agged = stream.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur, slideDur) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val rest = agged.columns.filterNot(_ == "window").map(col)
    agged.select(col("window.start").as("window_start") +:
      col("window.end").as("window_end") +: rest.toSeq: _*)
  }
}
