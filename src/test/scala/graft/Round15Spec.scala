package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Median

/** Round-15 contracts: the condensation-DAG depths on a planted
  * hand-computable graph, the weighted-quantile decomposition's two
  * exactness anchors (unit weights ≡ the unweighted decomposition;
  * hand-expanded fixture), and the PQ ADC scan's seed-exactness (a
  * corpus vector that IS a codebook seed must score the exact squared
  * L2 distance to every query — the lookup table contributes the whole
  * distance, so any error in LUT construction, code pivot, or the
  * 4-term sum shows up as a bit mismatch).
  */
class Round15Spec extends AnyFunSuite {
  import TestSession._

  test("q236: condensation depths on a planted two-chain DAG") {
    import spark.implicits._
    // SCCs {1,2} → {3,4} → {5} (depths 0,1,2) and {6} → {7} (0,1)
    val edges = Seq(
      (1L, 2L), (2L, 1L),
      (3L, 4L), (4L, 3L),
      (2L, 3L), (4L, 5L),
      (6L, 7L)
    ).toDF("src", "dst")
    val got = Queries.condensationDepths(edges)
      .orderBy("scc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 0L), (3L, 2L, 1L), (5L, 1L, 2L),
      (6L, 1L, 0L), (7L, 1L, 1L)))
  }

  test("q236: a 3-cycle feeding a 3-chain layers at depths 0..3") {
    import spark.implicits._
    val res = Queries.condensationDepths(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L))
        .toDF("src", "dst"))
    val rows = res.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // SCC {1,2,3} (id 1, depth 0) → 4 → 5 → 6
    assert(rows == Map(1L -> 0L, 4L -> 1L, 5L -> 2L, 6L -> 3L))
  }

  test("q235: unit weights reduce to the unweighted quantile decomposition bit-for-bit") {
    val base = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
      .withColumn("w", lit(1L))
    val weighted = Median.groupedWeightedQuantiles(base, "g", "v", "w",
        Queries.WqQuantiles, bucketScale = 1.0 / 64.0)
      .select(col("g"), col("q"), col("quantile"))
      .orderBy("g", "q").collect()
    val plain = Median.groupedExactQuantiles(base, "g", "v",
        Queries.WqQuantiles, bucketScale = 1.0 / 64.0)
      .orderBy("g", "q").collect()
    assert(weighted.length == plain.length && weighted.length > 0)
    weighted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) &&
        a.getDouble(1) == b.getDouble(1), s"$a vs $b")
      assert(a.getDouble(2) == b.getDouble(2),
        s"group ${a.getString(0)} q=${a.getDouble(1)}: " +
          s"${a.getDouble(2)} != ${b.getDouble(2)}")
    }
  }

  test("q235: hand-expanded fixture (weights as copies)") {
    import spark.implicits._
    // expanded multiset: 10,10,20,20,20,30 — quantile_cont positions
    val df = Seq(("a", 10.0, 2L), ("a", 20.0, 3L), ("a", 30.0, 1L))
      .toDF("g", "v", "w")
    val got = Median.groupedWeightedQuantiles(df, "g", "v", "w",
        Seq(0.0, 0.25, 0.5, 1.0), bucketScale = 1.0)
      .orderBy("q").collect()
      .map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3))).toSeq
    // pos = q·5: 0 → 10; 1.25 → 10·.75 + 20·.25 = 12.5; 2.5 → 20; 5 → 30
    assert(got == Seq((0.0, 6L, 10.0), (0.25, 6L, 12.5),
      (0.5, 6L, 20.0), (1.0, 6L, 30.0)))
  }

  test("q235: zero-weight rows carry no rank; all-zero groups are excluded") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 0L), ("a", 2.0, 1L), ("b", 9.0, 0L))
      .toDF("g", "v", "w")
    val got = Median.groupedWeightedQuantiles(df, "g", "v", "w", Seq(0.5))
      .collect()
    assert(got.length == 1 && got(0).getString(0) == "a" &&
      got(0).getDouble(3) == 2.0)
  }

  test("q237: a corpus vector that IS a codebook seed scores the exact squared L2") {
    val subDim = graft.functions.Lsh.Dim / Queries.PqSub
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val seeds = emb.filter(col("vec_id") >= Queries.AnnQueryMaxId)
      .orderBy("vec_id").limit(Queries.PqCodes)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val queries = emb.filter(col("vec_id") < Queries.AnnQueryMaxId)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(seeds.nonEmpty && queries.nonEmpty)
    // exact distance in the SAME association the ADC sum uses: sum of
    // per-subspace left-folds (a single 64-term fold differs in ulps)
    def exact(q: Seq[Double], x: Seq[Double]): Double =
      (0 until Queries.PqSub).map { sp =>
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = q(sp * subDim + i) - x(sp * subDim + i)
          acc += d * d
          i += 1
        }
        acc
      }.sum
    val scores = Queries.adcScores(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    var checked = 0
    for ((qid, qv) <- queries; (sid, sv) <- seeds) {
      val adc = scores((qid, sid))
      val ex = exact(qv, sv)
      assert(adc == ex,
        s"ADC($qid, seed $sid) = $adc != exact $ex")
      checked += 1
    }
    assert(checked >= Queries.PqCodes)
  }

  test("q238: both zone maps are supersets of truth; time bands prune better two-level") {
    val res = Queries.hilbertTwoLevelCompare(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // true matching rows per probe (the floor any zone map must cover)
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("y"))
    Queries.TwoLevelProbes.foreach { case (id, xlo, xhi, ylo, yhi) =>
      val truth = orders.filter(col("x").between(xlo, xhi) &&
        col("y").between(ylo, yhi)).count()
      val (_, rowsFlat, _, rowsTwo) = res(id)
      assert(rowsFlat >= truth && rowsTwo >= truth,
        s"probe $id: zone maps must be supersets ($rowsFlat/$rowsTwo vs $truth)")
    }
    // the time-band probe (all keys × one month): range-planning the
    // time dimension first must touch no MORE rows than the flat curve
    val (_, fRows, _, tRows) = res(2)
    assert(tRows <= fRows,
      s"time-band probe: two-level touched $tRows > flat $fRows")
  }

  test("q239: composed IVF+PQ scores agree with the full ADC scan on every returned pair") {
    val full = Queries.adcScores(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = Queries.ivfPqSearch(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(full(key) == r.getDouble(3),
        s"pair $key: composed ${r.getDouble(3)} != full-scan ${full(key)}")
    }
    // and at nprobe = all lists the composed search IS the full ADC
    // top-k (probing everything removes the only approximation layer)
    val labels = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= Queries.AnnQueryMaxId)
      .select("label").distinct().count()
    assert(Queries.IvfNProbe <= labels,
      "fixture sanity: nprobe must not exceed the list count")
  }

  test("q237: top-k output is rank-contiguous and ordered by (dist, vec_id)") {
    val rows = Queries.pqAdcTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"query $q ranks not contiguous")
      val dists = sorted.map(r => (r.getDouble(3), r.getLong(2)))
      assert(dists.sameElements(dists.sortBy(identity)),
        s"query $q not ordered by (dist, vec_id)")
    }
  }

}
