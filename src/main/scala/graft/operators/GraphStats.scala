package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph health metrics and matching rules over undirected edge
  * lists (pairs in either orientation, each unordered pair once).
  */
object GraphStats {

  /** One-row frame: vertex/edge counts, mean degree, and Newman's
    * degree assortativity r — the Pearson correlation of endpoint
    * degrees over DIRECTED edge pairs (each undirected edge contributes
    * both orientations, so the two marginals coincide and one moment
    * set serves both axes): r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²).
    * The SUMS stay exact int64 (Σx² ≈ M·d̄² — fine into the billions of
    * edges), but the multiply-through PRODUCTS M·Σx² and (Σx)² cross
    * 2^63 already at ~25M directed pairs (measured: the 10× replica
    * drill overflowed), so the final r is assembled in DECIMAL(38,0) —
    * still exact, still order-independent — with doubles only in the
    * last fixed-shape division; a degree-regular graph (zero variance)
    * nulls out.
    */
  def assortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(least(col(aCol), col(bCol)).as("x"),
      greatest(col(aCol), col(bCol)).as("y"))
    val deg = e.select(col("x").as("n"))
      .unionByName(e.select(col("y").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // the directed moment sums are SYMMETRIC functions of each
    // undirected edge's endpoint degrees — (x,y) and (y,x) contribute
    // dx+dy to Σx, dx²+dy² to Σx², and 2·dx·dy to Σxy — so the joins
    // run over the undirected frame (HALF the rows the explicit
    // directed union shipped) and the mirror orientation is folded in
    // arithmetically; exact int64 sums, identical values
    val m = e
      .join(deg.select(col("n").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("n").as("y"), col("deg").as("dy")), Seq("y"))
      .agg((count(lit(1)) * 2).as("mm"),
        sum(col("dx") + col("dy")).as("sx"),
        sum(col("dx") * col("dx") + col("dy") * col("dy")).as("sxx"),
        (sum(col("dx") * col("dy")) * 2).as("sxy"))
    val nv = deg.agg(count(lit(1)).as("n_nodes"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: org.apache.spark.sql.Column) = c.cast(dec)
    val den = d(col("mm")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val num = d(col("mm")) * d(col("sxy")) - d(col("sx")) * d(col("sx"))
    m.crossJoin(broadcast(nv))
      .select(col("n_nodes"), (col("mm") / lit(2L)).cast("long").as("n_edges"),
        (col("mm").cast("double") / col("n_nodes").cast("double"))
          .as("mean_degree"),
        when(den > d(lit(0L)),
          num.cast("double") / den.cast("double")).as("assortativity"))
  }

  /** Reciprocal (mutual) best matches under a similarity frame
    * (aCol, bCol, scoreCol — one row per unordered pair): keeps the
    * pairs where each side is the OTHER's single best partner — the
    * high-precision matching rule that stops hub vertices absorbing
    * everything. Per-vertex argmax as one struct-max over
    * (score, −partner) — deterministic whenever equal scores are truly
    * equal doubles (they are here: scores come from fixed-shape exact
    * arithmetic). Output keeps aCol < bCol.
    */
  def reciprocalBest(sim: DataFrame, aCol: String, bCol: String,
                     scoreCol: String): DataFrame = {
    val directed = sim.select(col(aCol).as("me"), col(bCol).as("other"),
        col(scoreCol).as("__s"))
      .unionByName(sim.select(col(bCol).as("me"), col(aCol).as("other"),
        col(scoreCol).as("__s")))
    val best = directed.groupBy("me")
      .agg(max(struct(col("__s").as("s"), (-col("other")).as("nego"))).as("m"))
      .select(col("me"), (-col("m.nego")).as("best"), col("m.s").as("__s"))
    val l = best.select(col("me").as(aCol), col("best").as(bCol),
      col("__s").as(scoreCol))
    val r = best.select(col("me").as(bCol), col("best").as(aCol))
    l.join(r, Seq(aCol, bCol), "left_semi")
      .filter(col(aCol) < col(bCol))
  }
}
