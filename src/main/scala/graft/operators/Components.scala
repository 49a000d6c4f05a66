package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate PAIRS into dedup decisions: each component
  * keeps one canonical document (its minimum id), everything else is a
  * duplicate of it.
  *
  * Algorithm: every node starts labeled with itself; each round, a node
  * takes the minimum label among itself and its neighbors. Labels only
  * decrease, so the sum of labels is a monotone convergence witness — the
  * loop stops when one round leaves the sum unchanged (fixpoint), after
  * O(component diameter) rounds. Near-dup graphs are overwhelmingly tiny
  * cliques/chains, so 2–4 rounds in practice.
  *
  * Scale: each round is one join + one aggregation on the edge list —
  * all-distributed, nothing driver-side except the 1-row convergence
  * check. For planet-scale graphs with long chains, switch to the
  * large-star/small-star variant (same primitives, fewer rounds); the
  * interface is unchanged.
  */
object Components {

  /** Component label (= min member id) per node. `nodes`: one `id`
    * column; `edges`: `src`/`dst` pairs (either orientation).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    // Persist the RAW edge list before mirroring: the union references
    // `edges` twice, and without the persist an expensive upstream (e.g.
    // the Jaccard pair pipeline) would be computed twice into the cache.
    val e0 = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bidir = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Each round's plan references the previous labels TWICE (probe side
    // and neighbor-min side), so lineage doubles per iteration — an eager
    // localCheckpoint truncates it to a leaf each round, keeping plan
    // size O(1) regardless of graph diameter.
    var labels = nodes.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var prevSum = BigDecimal(labels.agg(sum("label")).head().getLong(0))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = bidir.join(labels, bidir("dst") === labels("id"))
        .groupBy("src").agg(min("label").as("nbr_label"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      val s = BigDecimal(next.agg(sum("label")).head().getLong(0))
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    bidir.unpersist()
    e0.unpersist()
    labels
  }
}
