package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *  2. Backward fixpoint WITHIN each class: mark nodes that can reach
  *     their root through same-color edges. Marked ≡ SCC(root): such a
  *     node reaches r and is reached by r (that is what its color
  *     says); conversely any path r→…→v→…→r stays inside the class
  *     (a smaller ancestor of any path node would be a smaller
  *     ancestor of v too).
  *  3. Emit marked nodes with scc_id = color; peel them and repeat on
  *     the remainder (every class loses at least its root's SCC per
  *     round, so the loop terminates in ≤ condensation-depth rounds —
  *     measured 4–5 on the gated basket subgraph at every SF).
  *
  * Scale shape: every step is an equi-join or hash-agg on vertex keys
  * over frames that only shrink; `localCheckpoint(true)` per round
  * keeps plans O(1) in rounds (the PageRank discipline); the only
  * driver values are the per-round convergence counts (one long
  * each — the q199 peel pattern). Rounds are CAPPED and the caps are
  * REQUIRED non-binding: a partial fixpoint would silently merge or
  * split components, so the operator fails fast instead of returning
  * plausible wrong labels.
  *
  * Determinism: min-label over int64 ids — no RNG, no tiebreak
  * ambiguity; scc_id is the component's minimum node id, the same
  * canonical label the oracle's mutual-reachability closure computes.
  */
object Scc {

  /** (node, scc_id) for every vertex of `edges` (cols `src`, `dst`;
    * self-loops and duplicates tolerated). scc_id = min node id in the
    * component.
    */
  def components(edges: DataFrame,
                 maxOuterRounds: Int = 20,
                 maxPropRounds: Int = 40): DataFrame = {
    require(maxOuterRounds >= 1 && maxPropRounds >= 1,
      "SCC round caps must be positive")
    var remE = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    var remN = remE.select(col("src").as("n"))
      .unionByName(remE.select(col("dst").as("n"))).distinct()
      .localCheckpoint(true)
    var out: DataFrame = null
    var outer = 0
    var remaining = remN.count()
    while (remaining > 0 && outer < maxOuterRounds) {
      outer += 1
      // 1. forward min-label fixpoint over the remaining subgraph
      var color = remN.select(col("n"), col("n").as("c"))
        .localCheckpoint(true)
      var changed = 1L
      var prop = 0
      while (changed > 0 && prop < maxPropRounds) {
        prop += 1
        val upd = remE.join(color, remE("src") === color("n"))
          .groupBy(remE("dst").as("n2")).agg(min("c").as("cin"))
        val next = color.join(upd, color("n") === upd("n2"), "left")
          .select(color("n"), col("c").as("c_old"),
            least(col("c"), coalesce(col("cin"), col("c"))).as("c"))
          .localCheckpoint(true)
        changed = next.filter(col("c") < col("c_old")).count()
        color = next.select("n", "c")
      }
      require(changed == 0,
        s"SCC forward coloring did not fixpoint within $maxPropRounds rounds")
      // 2. backward root-reach fixpoint restricted to same-color edges
      val cs = color.select(col("n").as("src"), col("c").as("cs"))
      val cd = color.select(col("n").as("dst"), col("c").as("cd"))
      val ec = remE.join(cs, "src").join(cd, "dst")
        .filter(col("cs") === col("cd"))
        .select("src", "dst")
        .localCheckpoint(true)
      var marked = color.filter(col("n") === col("c")).select("n")
        .localCheckpoint(true)
      var added = 1L
      var back = 0
      while (added > 0 && back < maxPropRounds) {
        back += 1
        val newM = ec.join(marked.select(col("n").as("dst")), "dst")
          .select(col("src").as("n")).distinct()
          .join(marked, Seq("n"), "left_anti")
          .localCheckpoint(true)
        added = newM.count()
        if (added > 0) marked = marked.unionByName(newM).localCheckpoint(true)
      }
      require(added == 0,
        s"SCC backward marking did not fixpoint within $maxPropRounds rounds")
      // 3. emit the found components, peel, recurse on the remainder
      val found = color.join(marked, Seq("n"), "left_semi")
        .select(col("n").as("node"), col("c").as("scc_id"))
        .localCheckpoint(true)
      out = if (out == null) found else out.unionByName(found)
      remN = remN.join(marked, Seq("n"), "left_anti").localCheckpoint(true)
      remE = remE
        .join(marked.select(col("n").as("src")), Seq("src"), "left_anti")
        .join(marked.select(col("n").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst")
        .localCheckpoint(true)
      remaining = remN.count()
    }
    require(remaining == 0,
      s"SCC did not converge within $maxOuterRounds outer rounds " +
        s"($remaining nodes left)")
    // empty edge set: no vertices, empty result with the right schema
    if (out == null) remN.select(col("n").as("node"), col("n").as("scc_id"))
    else out
  }
}
