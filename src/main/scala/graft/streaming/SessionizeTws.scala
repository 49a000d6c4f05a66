package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[SessionizeStream]] re-expressed on Spark 4's `transformWithState`
  * — the arbitrary-state API that replaces flatMapGroupsWithState
  * (SPARK-46815). Identical semantics, gated against the SAME DuckDB
  * oracle as q127 (the q144↔q40 twin discipline), but the state
  * machinery is the current one:
  *
  *  - named `ValueState` instead of the single opaque GroupState blob —
  *    a processor can hold several independently-evolving states
  *    (schema evolution per state, not per operator);
  *  - explicit event-time TIMERS (`registerTimer`/`handleExpiredTimer`)
  *    instead of the one-shot `setTimeoutTimestamp` — a key can hold
  *    many timers, and expiry logic is a separate callback rather than
  *    a `hasTimedOut` branch inside the input path;
  *  - requires the RocksDB state store provider (multiple column
  *    families back the named states and the timer index), which is
  *    also the store that survives 100-TB state sizes: HDFS-backed
  *    keeps every version on the executor heap, RocksDB keeps state
  *    off-heap with changelog checkpointing.
  *
  * The session fold itself is [[SessionizeStream]]'s, verbatim: state
  * per key is the single OPEN session; in-batch events fold in event-
  * time order; sessions closed by a later event emit immediately; the
  * open tail emits — and its state and timer are freed — when the
  * watermark passes `last + gap`. State stays O(active keys).
  */
object SessionizeTws {

  import SessionizeStream.{Ev, EvT, Open, Session}

  /** The per-key processor: one named ValueState (the open session) and
    * at most one live event-time timer (its eviction deadline).
    */
  final class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, EvT, Session] {

    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTL is a ProcessingTime-mode facility; in EventTime mode the
      // timer IS the eviction mechanism, so the state itself is NONE.
      open = getHandle.getValueState[Open](
        "open", Encoders.product[Open], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvT],
                                 timerValues: TimerValues): Iterator[Session] = {
      // The previously-registered eviction timer rides the OLD `last`;
      // fold first, then re-arm on the new tail. Deleting up front (at
      // most one is ever live) keeps a stale deadline from flushing a
      // session an in-flight event just extended.
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      val sorted = rows.toArray.sortBy(e => (e.tsMicros, e.cents))
      var cur: Option[Open] = if (open.exists()) Some(open.get()) else None
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        cur match {
          case Some(o) if e.tsMicros - o.last <= gapMicros =>
            cur = Some(o.copy(last = e.tsMicros, n = o.n + 1,
              cents = o.cents + e.cents))
          case Some(o) =>
            closed += Session(key, o.seq, o.start, o.last, o.n, o.cents)
            cur = Some(Open(o.seq + 1, e.tsMicros, e.tsMicros, 1, e.cents))
          case None =>
            cur = Some(Open(1, e.tsMicros, e.tsMicros, 1, e.cents))
        }
      }
      cur.foreach { o =>
        open.update(o)
        // Same saturating deadline arithmetic as the fMGWS twin: a
        // "never expire" gap near Long.MaxValue must not overflow into
        // the past and flush every open session early.
        val evictAtMs =
          if (Long.MaxValue - gapMicros < o.last) Long.MaxValue
          else (o.last + gapMicros) / 1000 + 1
        getHandle.registerTimer(
          math.max(evictAtMs, timerValues.getCurrentWatermarkInMs + 1))
      }
      closed.result().iterator
    }

    /** Watermark passed `last + gap`: no non-late event can extend the
      * open session — flush it and free the key's state.
      */
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] =
      if (open.exists()) {
        val o = open.get()
        open.clear()
        Iterator.single(Session(key, o.seq, o.start, o.last, o.n, o.cents))
      } else Iterator.empty
  }

  def sessionize(events: Dataset[Ev], gapMicros: Long,
                 lateness: String = "0 seconds"): Dataset[Session] = {
    val evtEnc = Encoders.product[EvT]
    val watermarked = events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", lateness)
      .as(evtEnc)
    watermarked.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMicros),
        TimeMode.EventTime, OutputMode.Append)(Encoders.product[Session])
  }

  /** Run `body` with the RocksDB state store provider configured —
    * `transformWithState` refuses the default HDFS-backed store (named
    * states and timers need column families). Restores the previous
    * setting so co-resident fMGWS/windowed queries keep their store.
    * The provider conf is captured per-query AT START, so scoping it
    * around the start/awaitTermination pair is exact.
    */
  def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
