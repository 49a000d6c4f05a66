package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming one-sided CUSUM drift detector via `flatMapGroupsWithState`
  * — the ONLINE form of q204's retrospective changepoint scan (Page's
  * test): per key, daily event counts are folded into the clipped
  * cumulative statistic s = max(0, s + (c_day − ref)), where `ref` is
  * the key's reference daily rate (historical profile). The peak of s
  * and the day it occurred are the monitoring output: a sustained rate
  * above `ref` accumulates; a dip re-anchors at zero.
  *
  * State is O(1) per key — the open day's running count plus five
  * longs — so unlike the retrospective scan the detector never holds a
  * day series. Keys here are low-cardinality monitored series (event
  * types, tenant channels), hence `NoTimeout`: the state IS the
  * detector's memory and must survive silence (contrast
  * SessionizeStream, where per-key state must die with the session).
  *
  * A day CLOSES when a later event's day arrives (the open tail never
  * closes — same contract as the batch twin's exclusion of the last
  * day, and of SessionizeStream's open session). Events are folded in
  * event-time order within a batch; cross-batch order is the caller's
  * watermark/arrival contract and is ENFORCED — a day older than the
  * open day fails the query fast rather than corrupting the fold.
  *
  * Exactness: everything is int64 (counts, the clipped fold, the
  * argmax with earliest-day tiebreak), so the final state is
  * bit-comparable to the oracle's closed form
  * s_i = cum_i − min(0, min_{j≤i} cum_j) — the prefix-min
  * decomposition of the non-associative clipped fold (q167's family).
  */
object CusumStream {

  /** An input event: monitored key + event-time micros. */
  final case class CEv(key: String, tsMicros: Long)

  /** Detector state: the open day and the CUSUM fold over closed days.
    * `maxS` starts at Long.MinValue so the first closed day always
    * seats the peak; strict `>` afterwards = earliest-day tiebreak.
    */
  final case class CState(curDay: Long, curCount: Long, s: Long,
                          maxS: Long, peakDay: Long, nClosed: Long)

  /** Post-batch snapshot per key (update mode; monotone in n_days). */
  final case class CusumSnap(key: String, n_days: Long, final_cusum: Long,
                             max_cusum: Long, peak_day: Long)

  private val MicrosPerDay = 86400000000L

  def detect(events: Dataset[CEv], refs: Map[String, Long])
      : Dataset[CusumSnap] = {
    val snapEnc = Encoders.product[CusumSnap]
    val keyEnc = Encoders.STRING
    val stateEnc = Encoders.product[CState]

    events.groupByKey(_.key)(keyEnc)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[CEv], state: GroupState[CState]) => {
          val ref = refs.getOrElse(key, 0L)
          val days = it.map(_.tsMicros / MicrosPerDay).toArray
          java.util.Arrays.sort(days)
          var st = state.getOption.getOrElse(
            CState(Long.MinValue, 0L, 0L, Long.MinValue, Long.MinValue, 0L))
          days.foreach { d =>
            // Enforce the documented arrival contract instead of folding a
            // regressed day into corrupted state: an event whose day
            // precedes the open day would silently close the open day and
            // re-open the earlier one (wrong n_days/s with no error). The
            // caller's watermark discipline owns cross-batch order; a
            // violation here must surface, not produce plausible output.
            if (st.curDay != Long.MinValue && d < st.curDay)
              throw new IllegalStateException(
                s"CusumStream[$key]: out-of-order day $d arrived after open " +
                  s"day ${st.curDay} — the caller must deliver days " +
                  "non-decreasing across batches (watermark contract)")
            if (d == st.curDay) st = st.copy(curCount = st.curCount + 1)
            else {
              if (st.curDay != Long.MinValue) {
                // close the open day: clipped fold + peak tracking
                val s1 = math.max(0L, st.s + (st.curCount - ref))
                val seat = s1 > st.maxS
                st = CState(d, 1L, s1,
                  if (seat) s1 else st.maxS,
                  if (seat) st.curDay else st.peakDay,
                  st.nClosed + 1)
              } else st = st.copy(curDay = d, curCount = 1L)
            }
          }
          state.update(st)
          if (st.nClosed >= 1)
            Iterator.single(CusumSnap(key, st.nClosed, st.s, st.maxS, st.peakDay))
          else Iterator.empty
        })(stateEnc, snapEnc)
  }
}
