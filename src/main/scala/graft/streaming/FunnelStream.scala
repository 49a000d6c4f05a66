package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Real-time conversion-funnel tracking via `mapGroupsWithState`: per
  * user, the earliest view → first click after it → first purchase after
  * that (the same chain as the batch funnel, SparkEntry q66), advanced
  * incrementally as events arrive.
  *
  * Reference analog: the gold-layer engagement aggregates over
  * `FactStream` (gold_notebook.py) — re-expressed as an incrementally
  * maintained stage per user instead of a nightly rebuild.
  *
  * Contract: state per key is the three step timestamps (None = step not
  * reached); a batch's events are folded in event-time order; the
  * CURRENT stage row is emitted for every user updated in the batch
  * (update semantics — downstream sinks upsert by user_id). State is
  * O(users) and three longs wide, independent of stream length.
  *
  * A later batch can only move a step EARLIER if the stream delivers an
  * out-of-order event older than a committed step; like the reference's
  * sequenced CDC flows, cross-batch order is the source's contract.
  * Within a batch, events are sorted by event time, so intra-batch
  * disorder is absorbed.
  */
object FunnelStream {

  /** An input event: user, event-time micros, step name. */
  final case class FEv(user: Long, tsMicros: Long, step: String)

  /** Funnel progress for a user: stage 0-3 and the step timestamps. */
  final case class Funnel(user: Long, stage: Int,
                          view_micros: Option[Long],
                          click_micros: Option[Long],
                          purchase_micros: Option[Long])

  /** State kept per user (public: Catalyst's generated encoder code
    * cannot access private classes).
    */
  final case class FState(view: Option[Long], click: Option[Long],
                          purchase: Option[Long])

  private def fold(s: FState, e: FEv): FState = e.step match {
    case "view" if s.view.forall(e.tsMicros < _) =>
      // an earlier view invalidates any click/purchase chain? No — an
      // EARLIER first view only widens what counts as "after the view",
      // so existing later steps stay valid.
      s.copy(view = Some(e.tsMicros))
    case "click" if s.view.exists(_ < e.tsMicros) &&
        s.click.forall(e.tsMicros < _) =>
      // a new earliest click after the view; a purchase committed after
      // an older click stays valid (it is still after this earlier click)
      s.copy(click = Some(e.tsMicros))
    case "purchase" if s.click.exists(_ < e.tsMicros) &&
        s.purchase.forall(e.tsMicros < _) =>
      s.copy(purchase = Some(e.tsMicros))
    case _ => s
  }

  private def stageOf(s: FState): Int =
    if (s.purchase.isDefined) 3
    else if (s.click.isDefined) 2
    else if (s.view.isDefined) 1
    else 0

  def track(events: Dataset[FEv]): Dataset[Funnel] = {
    val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[FState]
    val outEnc = Encoders.product[Funnel]
    events.groupByKey(_.user)(longEnc)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[FEv], state: GroupState[FState]) => {
          val sorted = it.toArray.sortBy(e => (e.tsMicros, e.step))
          var s = state.getOption.getOrElse(FState(None, None, None))
          sorted.foreach { e => s = fold(s, e) }
          state.update(s)
          Funnel(user, stageOf(s), s.view, s.click, s.purchase)
        })(stateEnc, outEnc)
  }
}
