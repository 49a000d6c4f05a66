package graft.streaming

import org.apache.spark.sql.DataFrame

/** Stateful streaming deduplication by business key.
  *
  * Reference analog: the silver layer's streaming `dropDuplicates` on the
  * dimension business key (reference: local_spotify_dab/src/silver/
  * Silver_Dimensions.py:447, :684).
  *
  * Two variants with different state-lifetime contracts:
  * - `exactKeys` keeps every seen key in state forever — correct for
  *   bounded/backfill streams (`availableNow` reruns), unbounded state on
  *   a 24/7 stream.
  * - `withinWatermark` evicts state once the event-time watermark passes —
  *   the only shape that survives an unbounded 100 TB/day stream; the
  *   trade is that duplicates farther apart than `delay` pass through,
  *   which is the documented CDC redelivery window.
  */
object StreamingDedup {

  /** Exact key dedup (unbounded state — bounded streams only). */
  def exactKeys(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Watermark-bounded dedup: duplicates arriving within `delay` of the
    * first occurrence are dropped; state is evicted afterwards.
    */
  def withinWatermark(stream: DataFrame, tsCol: String, delay: String,
                      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
