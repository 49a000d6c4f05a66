package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` —
  * the arbitrary-state API the built-in windowed aggregations can't
  * express (a session's extent depends on the data, not the clock).
  *
  * Contract: state per key is the single OPEN session; a batch's events
  * are folded in event-time order; every session CLOSED by a later event
  * is emitted immediately (append mode); the open tail stays in state
  * until a future batch closes it. State size is O(keys), independent of
  * stream length — the property that matters at 100 TB/day.
  *
  * Ordering: events are sorted per key WITHIN each batch; cross-batch
  * order must be provided by the source (time-partitioned landing data or
  * a watermarked upstream), the same contract the reference's sequenced
  * CDC flows assume.
  */
object SessionizeStream {

  /** An input event: key, event-time micros, value in exact cents. */
  final case class Ev(key: Long, tsMicros: Long, cents: Long)

  /** A closed session. */
  final case class Session(key: Long, session_seq: Long, start_micros: Long,
                           end_micros: Long, n_events: Long, total_cents: Long)

  /** The single open session kept in state per key (public: Catalyst's
    * generated encoder code cannot access private classes).
    */
  final case class Open(seq: Long, start: Long, last: Long,
                        n: Long, cents: Long)

  def sessionize(events: Dataset[Ev], gapMicros: Long): Dataset[Session] = {
    val sessionEnc = Encoders.product[Session]
    val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[Open]

    events.groupByKey(_.key)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[Ev], state: GroupState[Open]) => {
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
          open.foreach(state.update)
          closed.result().iterator
        })(stateEnc, sessionEnc)
  }
}
