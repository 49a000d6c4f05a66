package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LeanCheckpoint

/** Strongly-connected components of a directed graph by forward
  * min-label coloring + backward root-reach marking (Orzan's coloring
  * scheme — the FW-BW family member that is pure label propagation, so
  * it rides the q155/q186/q216 join+agg machinery instead of needing
  * per-vertex recursion).
  *
  * Each OUTER round over the remaining subgraph:
  *  1. Forward fixpoint: color(v) = min id over {v} ∪ ancestors(v),
  *     propagated along edges until no label drops. Every color class
  *     then has a ROOT r with color(r) = r (if some smaller a reached
  *     r, a also reaches everything r colored — contradiction), and an
  *     SCC never straddles classes (its members share ancestor sets).
  *  2. Backward fixpoint WITHIN each class: m(v) = min id over {v} ∪
  *     descendants of v along same-color edges. The root r is its
  *     class's minimum id (every member's color is r, and color ≤ own
  *     id), so m(v) = color(v) ⟺ v reaches r ⟺ v ∈ SCC(r): such a
  *     node reaches r and is reached by r (that is what its color
  *     says); conversely any path r→…→v→…→r stays inside the class
  *     (a smaller ancestor of any path node would be a smaller
  *     ancestor of v too).
  *  3. Emit marked nodes with scc_id = color; peel them and repeat on
  *     the remainder (every class loses at least its root's SCC per
  *     round, so the loop terminates in ≤ condensation-depth rounds —
  *     measured 4–5 on the gated basket subgraph at every SF).
  *
  * BOTH fixpoints are min-label propagations with POINTER JUMPING (the
  * Components.scala path halving): label values are node ids, so
  * label(label(v)) is one equi-join of the label table with itself;
  * each round takes the min of the edge-propagated label and the
  * jumped label. Plain edge-min needs O(longest path) rounds — a
  * 100-hop chain takes 100; the jump halves every label path per
  * round, giving O(log diameter). Correctness invariant (both
  * phases): a label is always the id of a node in the set it
  * summarizes ({v} ∪ ancestors, resp. {v} ∪ same-color descendants),
  * and those sets are closed under following labels — so jumped
  * labels never undershoot the true min, and a round that changes
  * nothing is an edge-propagation fixpoint too (labels only decrease;
  * round-end equality forces the edge step to have been a no-op).
  * The backward phase reuses the same fixpoint on REVERSED same-color
  * edges; marked ⟺ m(v) = color(v), since the class root is the
  * class minimum.
  *
  * Round materialization uses `LeanCheckpoint` (a bare LogicalRDD
  * leaf), NOT `Dataset.localCheckpoint`: the builtin carries origin
  * stats/constraints into each leaf and iterated self-joins compound
  * that metadata — measured ~2.5× DRIVER time growth per round at
  * constant stage/task/record counts (restricted sf0.01 verify 53 s →
  * 695 s) until the loop crawls. See LeanCheckpoint's scaladoc.
  *
  * Scale shape: every step is an equi-join or hash-agg on vertex keys
  * over frames that only shrink; one lean checkpoint per round keeps
  * plans O(1) in rounds (the PageRank discipline); the only driver
  * values are per-round 1-row label sums (the Components monotone
  * convergence witness — labels only decrease, so an unchanged sum IS
  * elementwise fixpoint). Rounds are CAPPED and the caps are REQUIRED
  * non-binding: a partial fixpoint would silently merge or split
  * components, so the operator fails fast instead of returning
  * plausible wrong labels.
  *
  * Determinism: min-label over int64 ids — no RNG, no tiebreak
  * ambiguity; scc_id is the component's minimum node id, the same
  * canonical label the oracle's mutual-reachability closure computes.
  */
object Scc {

  private def ckpt(df: DataFrame): DataFrame =
    LeanCheckpoint.localCheckpoint(df)

  /** Jumped min-label fixpoint: starting from label(v) = v, repeatedly
    * set label(v) = min(label(v), min over in-edge labels (flowing
    * src → dst), label(label(v))) until the label sum is unchanged.
    * Returns (n, c) at fixpoint. Fails fast if `maxRounds` binds.
    */
  private def minLabelFixpoint(nodes: DataFrame, edges: DataFrame,
                               maxRounds: Int, what: String): DataFrame = {
    // every round is exactly ONE job: the convergence witness (label
    // sum) rides the materializing action (localCheckpointSummed), so
    // the loop pays no separate aggregate job — at fixpoint scale the
    // sequential job latency is the cost, not the row work.
    // The edge frame is joined on `src` EVERY round: cache it
    // hash-partitioned on the join key, data-sized (IterParts — the
    // Components/PageRank §2.4 discipline), and build the per-round
    // hash table on the O(nodes) label side, so rounds neither
    // exchange nor sort the O(edges) frame.
    val eP = edges
      .repartition(IterParts.forRows(edges, edges.count(), 24), col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (lab, _, prevSum) = LeanCheckpoint.localCheckpointSummed(
      nodes.select(col("n"), col("n").as("c")), "c")
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val upd = eP.join(lab.hint("shuffle_hash"), eP("src") === lab("n"))
        .groupBy(eP("dst").as("n2")).agg(min("c").as("cin"))
      val stepped = lab.join(upd, lab("n") === upd("n2"), "left")
        .select(lab("n"),
          least(col("c"), coalesce(col("cin"), col("c"))).as("step"))
      // pointer jump (path halving): follow the stepped label to ITS
      // label — one self-join, since every label value is a node id.
      // (Chaining MORE lookups through the round-start table was tried
      // and measured a no-op on the gated graph — real label forests
      // saturate at self-labeled roots after one hop, so the extra
      // joins buy nothing; the cycle-graph worst case where they would
      // pay is not what basket/citation graphs look like.)
      val parents = lab.select(col("n").as("p_id"), col("c").as("p_c"))
      val roundFrame = stepped
        .join(parents, stepped("step") === parents("p_id"), "left")
        .select(stepped("n"),
          least(col("step"), coalesce(col("p_c"), col("step"))).as("c"))
      if (round == 2) graft.RoundPlanDump.dump("scc_minlabel_round2", roundFrame)
      val (next, _, s) = LeanCheckpoint.localCheckpointSummed(roundFrame, "c")
      lab = next
      converged = s == prevSum
      prevSum = s
    }
    // `lab` is a checkpointed leaf — it no longer references the cache
    eP.unpersist()
    require(converged,
      s"SCC $what did not fixpoint within $maxRounds rounds")
    if (sys.env.contains("GRAFT_SCC_DEBUG"))
      System.err.println(s"[scc] $what: $round rounds")
    lab
  }

  /** (node, scc_id) for every vertex of `edges` (cols `src`, `dst`;
    * self-loops and duplicates tolerated). scc_id = min node id in the
    * component.
    *
    * Each outer round opens with a TRIM pass (VERDICT r16 item 5): a
    * vertex with no incoming — or no outgoing — edge from ANOTHER
    * vertex cannot sit on a cycle through other vertices, so it is a
    * singleton SCC; peel it, and repeat, because peeling exposes the
    * next layer of a tendril. On the bow-tie graphs SCC meets in
    * practice (giant core + feed-in/feed-out periphery — the gated
    * basket graph measures exactly this shape) trim removes the bulk
    * of the vertices for two anti-joins per layer, and the expensive
    * double fixpoint then runs only on the recirculating core. Trim is
    * an OPTIMIZATION, not a correctness gate: a partial trim (the
    * layer cap binding on a pathologically long tendril) just leaves
    * more work for the coloring, which handles every shape — so
    * unlike the fixpoint caps, `maxTrimRounds` carries no require.
    * Self-loops are EXCLUDED from the degree test (v→v makes no cycle
    * with others) but v itself still emits as the singleton SCC {v}.
    */
  def components(edges: DataFrame,
                 maxOuterRounds: Int = 20,
                 maxPropRounds: Int = 40,
                 maxTrimRounds: Int = 15): DataFrame = {
    require(maxOuterRounds >= 1 && maxPropRounds >= 1,
      "SCC round caps must be positive")
    val dbg = sys.env.contains("GRAFT_SCC_DEBUG")
    var t0 = System.nanoTime()
    def lap(what: String): Unit = if (dbg) {
      System.err.println(f"[scc] $what: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    var remE = ckpt(edges.select(col("src"), col("dst")).distinct())
    var remN = ckpt(remE.select(col("src").as("n"))
      .unionByName(remE.select(col("dst").as("n"))).distinct())
    var out: DataFrame = null
    var outer = 0
    var remaining = remN.count()
    lap("graph build")
    while (remaining > 0 && outer < maxOuterRounds) {
      outer += 1
      // 0. trim: peel trivial (tendril) SCCs layer by layer. Each layer
      // is exactly ONE job — the layering is sequential by nature (a
      // peel exposes the next tendril node), so job count is the whole
      // cost, and the first 4-job-per-layer form measured MORE
      // expensive than the fixpoints it saves. Per layer: live nodes =
      // remN minus the accumulated peeled leaves (flat anti-join — each
      // trivial frame is a ckpt'd leaf), one degree aggregation over
      // the live non-self edges (semi-joined against live nodes inside
      // the same plan, so remE is never re-materialized per layer), and
      // trivial = live nodes with din = 0 or dout = 0 (a no-edge node
      // has no degree row at all — the left join's null arm). remN and
      // remE shrink ONCE when trim settles.
      // Round 19 (VERDICT r18 item 3): ONE job per trim layer instead
      // of two. The layer's peeled/kept split is materialized as a
      // single TAGGED checkpoint — rows carry triv=1 (peeled) or triv=0
      // (still live), so localCheckpointSummed's column sum IS the peel
      // count and the one leaf serves BOTH the emitted singletons
      // (triv=1 filter) and the new remN (triv=0 filter); the previous
      // form paid a second materializing job per layer for the remN
      // anti-join checkpoint. (A speculative k-layer in-plan unroll was
      // tried first and MEASURED catastrophic — the live set is
      // referenced ~3× per unrolled layer, so plan size and runtime
      // recompute grow ~3^k: sf0.001 trim went 2 s → 60 s. Reverted;
      // negative result kept for the record.)
      var trimRound = 0
      var trimming = true
      var trimmedAny = false
      while (trimming && trimRound < maxTrimRounds && remaining > 0) {
        trimRound += 1
        val live = remN.select("n")
        val eLive = remE.filter(col("src") =!= col("dst"))
          .join(live.select(col("n").as("src")), Seq("src"), "left_semi")
          .join(live.select(col("n").as("dst")), Seq("dst"), "left_semi")
        val deg = eLive.select(col("src").as("n"), lit(0L).as("i"),
            lit(1L).as("o"))
          .unionByName(eLive.select(col("dst").as("n"), lit(1L).as("i"),
            lit(0L).as("o")))
          .groupBy("n").agg(sum("i").as("din"), sum("o").as("dout"))
        val (batch, _, sTriv) = LeanCheckpoint.localCheckpointSummed(
          live.join(deg, Seq("n"), "left")
            .select(col("n"),
              when(col("din").isNull || col("din") === 0L ||
                col("dout") === 0L, 1L).otherwise(0L).as("triv")), "triv")
        val nTriv = sTriv.toLong
        if (dbg)
          System.err.println(s"[scc] trim layer $trimRound: $nTriv peeled")
        if (nTriv == 0) trimming = false
        else {
          val found = batch.filter(col("triv") === 1L)
            .select(col("n").as("node"), col("n").as("scc_id"))
          out = if (out == null) found else out.unionByName(found)
          remN = batch.filter(col("triv") === 0L).select("n")
          trimmedAny = true
          remaining -= nTriv
        }
      }
      if (trimmedAny && remaining > 0)
        remE = ckpt(remE
          .join(remN.select(col("n").as("src")), Seq("src"), "left_semi")
          .join(remN.select(col("n").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst"))
      lap(s"trim (outer $outer)")
      if (remaining == 0) {
        // trim finished the graph; nothing left to color this round
      } else {
      // 1. forward min-label fixpoint over the remaining subgraph
      val color = minLabelFixpoint(remN, remE, maxPropRounds,
        s"forward coloring (outer round $outer)")
      // 2. backward min-reach fixpoint restricted to same-color edges:
      //    the same jumped min-label propagation on REVERSED edges —
      //    m(v) = min over {v} ∪ same-color descendants(v)
      val cs = color.select(col("n").as("src"), col("c").as("cs"))
      val cd = color.select(col("n").as("dst"), col("c").as("cd"))
      val ecRev = ckpt(remE.join(cs, "src").join(cd, "dst")
        .filter(col("cs") === col("cd"))
        .select(col("dst").as("src"), col("src").as("dst")))
      lap(s"forward+ecRev (outer $outer)")
      val reach = minLabelFixpoint(remN, ecRev, maxPropRounds,
        s"backward marking (outer round $outer)")
      // marked ⟺ m(v) = color(v): the class root is the class MIN id,
      // so reaching it is the only way m can hit the color value
      val marked = ckpt(reach.select(col("n"), col("c").as("m"))
        .join(color, "n")
        .filter(col("m") === col("c"))
        .select(col("n"), col("c")))
      // 3. emit the found components, peel, recurse on the remainder
      // (no checkpoint on `found`: marked is a leaf, the plan is flat)
      val found = marked.select(col("n").as("node"), col("c").as("scc_id"))
      out = if (out == null) found else out.unionByName(found)
      val mN = marked.select("n")
      val (remN2, nRem, _) = LeanCheckpoint.localCheckpointSummed(
        remN.join(mN, Seq("n"), "left_anti"), "n")
      remN = remN2
      remE = ckpt(remE
        .join(mN.select(col("n").as("src")), Seq("src"), "left_anti")
        .join(mN.select(col("n").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst"))
      remaining = nRem
      lap(s"backward+peel (outer $outer)")
      }
    }
    require(remaining == 0,
      s"SCC did not converge within $maxOuterRounds outer rounds " +
        s"($remaining nodes left)")
    // empty edge set: no vertices, empty result with the right schema
    if (out == null) remN.select(col("n").as("node"), col("n").as("scc_id"))
    else out
  }
}
