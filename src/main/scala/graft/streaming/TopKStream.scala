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

    // best-first total order: v DESC, then id ASC; 0 only on an
    // identical pair (set semantics) — TopKAgg.Ord's contract
    val ord = new java.util.Comparator[Array[Long]] with Serializable {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val byV = java.lang.Long.compare(b(0), a(0))
        if (byV != 0) byV else java.lang.Long.compare(a(1), b(1))
      }
    }

    events.groupByKey(_.key)(keyEnc)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[TEv], state: GroupState[TopState]) => {
          // bounded insert-evict against the k-floor (O(log k) per event,
          // like the batch aggregate's buffer — an append-then-truncate
          // fold would be O(batch²) in the per-key batch size)
          val buf = new java.util.TreeSet[Array[Long]](ord)
          state.getOption.foreach(s =>
            s.vs.indices.foreach(i => buf.add(Array(s.vs(i), s.ids(i)))))
          it.foreach { e =>
            val entry = Array(e.v, e.id)
            if (buf.size < k) { buf.add(entry); () }
            else if (ord.compare(entry, buf.last()) < 0) {
              // strictly better than the current k-th: admit, evict worst
              if (buf.add(entry)) { buf.remove(buf.last()); () }
            }
          }
          val kept = new Array[Array[Long]](buf.size)
          val bit = buf.iterator()
          var i = 0
          while (bit.hasNext) { kept(i) = bit.next(); i += 1 }
          state.update(TopState(kept.map(_(0)), kept.map(_(1))))
          kept.iterator.zipWithIndex.map { case (e, r) =>
            TopEntry(key, r + 1, e(0), e(1))
          }
        })(stateEnc, outEnc)
  }
}
