package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scc

/** Round-17 contracts (VERDICT r16 directives). */
class Round17Spec extends AnyFunSuite {
  import TestSession._

  // --- directive 5: trivial-SCC trim ----------------------------------------------

  test("Scc trim+color ≡ color alone (planted tendril graph and the gated basket graph)") {
    import spark.implicits._
    // planted: two cycles, a one-way bridge, in-tendril AND out-tendril
    // chains deep enough to need several trim layers, plus an isolated
    // self-loop (degree test must ignore the self edge but still emit
    // the singleton)
    val planted = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L),    // SCC {10,11,12}
      (20L, 21L), (21L, 20L),                // SCC {20,21}
      (12L, 20L),                            // bridge
      (1L, 2L), (2L, 3L), (3L, 10L),         // in-tendril 1→2→3→core
      (20L, 30L), (30L, 31L), (31L, 32L),    // out-tendril core→30→31→32
      (40L, 40L)                             // self-loop singleton
    ).toDF("src", "dst")
    val basket = Queries.basketEdges(spark, sf)
    for (edges <- Seq(planted, basket)) {
      val trimmed = Scc.components(edges)
      val colored = Scc.components(edges, maxTrimRounds = 0)
      assert(trimmed.exceptAll(colored).isEmpty &&
        colored.exceptAll(trimmed).isEmpty,
        "trim must be label-invariant: trim+color ≡ color alone")
    }
  }

  // --- directive 1: the clustered ANN operating point ------------------------------

  test("cfx fixture is clustered: separation >> spread, and exact top-k stays in-cluster") {
    val rep = Queries.cfxFixtureReport(spark, sf).collect()
    assert(rep.length == Queries.CfxClusters)
    val maxWithin = rep.map(_.getDouble(2)).max
    val minInter = rep.map(_.getDouble(3)).min
    assert(minInter > 100 * maxWithin,
      s"planted mixture must separate: min inter $minInter vs within $maxWithin")
    // the clustered-regime consequence the recall rows rely on: every
    // exact L2 neighbor shares its query's planted cluster
    val emb = Queries.clusteredEmbeddings(spark, sf)
    val lab = emb.select(col("vec_id"), col("label"))
    val crossCluster = Queries.exactL2TopKFrom(emb)
      .join(lab.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), "query_id")
      .join(lab, "vec_id")
      .filter(col("ql") =!= col("label")).count()
    assert(crossCluster == 0, "exact top-k crossed a planted cluster")
  }

  test("cfx recall instrument reads 1.0 on the ground truth itself") {
    val truth = Queries.exactL2TopKFrom(Queries.clusteredEmbeddings(spark, sf))
    val r = Queries.recallOf(truth, truth).collect()
    assert(r.nonEmpty && r.forall(_.getDouble(2) == 1.0))
  }

  test("cfx operating point: trained residual reads a usable recall and beats raw at equal budget") {
    // the r16 directive-1 'done' criterion, pinned: recall@5 ≥ ~0.8 at
    // nprobe ≪ lists for the trained-residual encode, strictly above
    // the raw encode at the identical code budget and training.
    // (Deterministic fixture: sf0.001 reads 0.92 avg vs 0.80 avg.)
    assert(Queries.CfxNProbe * 8 <= Queries.CfxClusters, "nprobe must be << lists")
    val tr = Queries.cfxTrainedRecall(spark, sf).collect()
    val rw = Queries.cfxRawRecall(spark, sf).collect()
    val trAvg = tr.map(_.getDouble(2)).sum / tr.length
    val rwAvg = rw.map(_.getDouble(2)).sum / rw.length
    assert(trAvg >= 0.8, s"trained-residual recall@5 avg $trAvg below the usable bar")
    assert(trAvg > rwAvg,
      s"residual must beat raw at equal budget on clustered data: $trAvg vs $rwAvg")
  }

  test("Scc trim peels a pure tendril forest entirely (no fixpoint rounds needed)") {
    import spark.implicits._
    // a DAG has only singleton SCCs; trim alone must finish it
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Scc.components(dag).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }
}
