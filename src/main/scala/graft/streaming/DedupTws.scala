package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming key-registry dedup on `transformWithState` with native
  * state TTL — the twin of [[StreamingDedup.withinWatermark]] (q137)
  * on the arbitrary-state API.
  *
  * `dropDuplicatesWithinWatermark` bounds its seen-set by EVENT time
  * (the watermark evicts); this processor bounds it by PROCESSING time:
  * each key's `seen` ValueState carries a TTL, and once the TTL lapses
  * the store forgets the key — a later re-arrival re-emits. That is the
  * operating shape of a 100-TB-scale online registry (fraud/dedup
  * caches): state is O(keys seen within the TTL horizon), a knob set by
  * memory budget rather than by stream disorder. With a TTL far longer
  * than a bounded run, the emission set equals the batch DISTINCT —
  * which is what lets the fixture gate it against q137's own oracle.
  *
  * TTL is only available in ProcessingTime mode (event-time stores
  * evict by watermark/timers instead), so this processor runs
  * TimeMode.ProcessingTime and needs no watermark on the input.
  */
object DedupTws {

  /** The dedup key; also the emitted row (the key functionally
    * determines every column, so the emission SET is deterministic even
    * though which duplicate arrives first is not).
    */
  final case class Key3(user_id: Long, day: java.sql.Date, event_type: String)

  /** First-sight filter: one Boolean ValueState per key, TTL-bounded. */
  final class FirstSeen(ttl: java.time.Duration)
      extends StatefulProcessor[Key3, Key3, Key3] {

    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: Key3, rows: Iterator[Key3],
                                 timerValues: TimerValues): Iterator[Key3] =
      // exists() is TTL-aware: an expired entry reads as absent, so the
      // key re-emits — the registry forgets, by design.
      if (seen.exists()) Iterator.empty
      else { seen.update(true); Iterator.single(key) }
  }

  /** Distinct `Key3` rows, first occurrence per TTL horizon. */
  def registry(keys: Dataset[Key3], ttl: java.time.Duration): DataFrame = {
    val enc = Encoders.product[Key3]
    keys.groupByKey(identity)(enc)
      .transformWithState(new FirstSeen(ttl),
        TimeMode.ProcessingTime, OutputMode.Append)(enc)
      .toDF()
  }
}
