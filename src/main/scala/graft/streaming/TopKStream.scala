package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key TOP-K via `flatMapGroupsWithState` — the stream
  * form of the native heap aggregate (plans/TopKAgg, gated q197/q214):
  * per key, the k greatest (value, id) pairs under the total order
  * (value DESC, id ASC) observed so far, re-emitted as a ranked
  * snapshot after every batch that touched the key (update mode).
  *
  * State is the same bounded k-entry order statistic as the batch
  * aggregate — O(k) longs per key, monotone under any arrival order,
  * so the final snapshot is bit-identical to the batch window form
  * regardless of batching. That monotonicity is also the reduction
  * rule for a multi-batch emission log: every snapshot's entries are
  * pairs that were top-k at SOME prefix, and any pair of the true
  * final top-k is in the final snapshot — so re-ranking the DISTINCT
  * union of all snapshots under the same order and keeping k recovers
  * exactly the final state (the gated query does this).
  *
  * `NoTimeout` for the same reason as CusumStream: keys are monitored
  * series (leaderboards per channel), and the state is the answer.
  */
object TopKStream {

  /** An input observation: key, integral value, integral id. */
  final case class TEv(key: String, v: Long, id: Long)

  /** One ranked snapshot row. */
  final case class TopEntry(key: String, rank: Int, v: Long, id: Long)

  /** Bounded state: the k best (v, id) pairs, best-first. */
  final case class TopState(vs: Array[Long], ids: Array[Long])

  def track(events: Dataset[TEv], k: Int): Dataset[TopEntry] = {
    require(k > 0, s"top-k needs k > 0, got $k")
    val outEnc = Encoders.product[TopEntry]
    val keyEnc = Encoders.STRING
    val stateEnc = Encoders.product[TopState]

    // best-first total order: v DESC, then id ASC (TopKAgg.Ord)
    def better(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    events.groupByKey(_.key)(keyEnc)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[TEv], state: GroupState[TopState]) => {
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          state.getOption.foreach(s => buf ++= s.vs.zip(s.ids))
          it.foreach { e =>
            // set semantics like the batch aggregate: duplicates collapse
            if (!buf.contains((e.v, e.id))) buf += ((e.v, e.id))
          }
          val kept = buf.sortWith((a, b) => better(a._1, a._2, b._1, b._2))
            .take(k)
          state.update(TopState(kept.map(_._1).toArray, kept.map(_._2).toArray))
          kept.iterator.zipWithIndex.map { case ((v, id), i) =>
            TopEntry(key, i + 1, v, id)
          }
        })(stateEnc, outEnc)
  }
}
