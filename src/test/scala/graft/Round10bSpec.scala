package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ZOrderExprs

/** Property specs for the q147–q152 batch (Z-order layout, sequence
  * mining, range planning, cross-source similarity, RRF, FD profiling).
  */
class Round10bSpec extends AnyFunSuite {
  import TestSession._

  // --- q147: Z-order -----------------------------------------------------

  test("spread16/morton16 match the bit-interleave definition") {
    def slowSpread(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).reduce(_ | _)
    val cases = Seq(0L, 1L, 2L, 3L, 0xFFL, 0xFFFFL, 0xA5C3L, 54321L)
    for (v <- cases) assert(ZOrderExprs.spread16(v) == slowSpread(v), s"v=$v")
    assert(ZOrderExprs.spread16(0xFFFFL) == 0x55555555L)
    // morton16 in the engine (codegen path) equals the Scala definition
    import spark.implicits._
    val df = cases.flatMap(x => cases.map(y => (x, y))).toDF("x", "y")
      .select(col("x"), col("y"), ZOrderExprs.morton16(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      val exp = ZOrderExprs.spread16(r.getLong(0)) | (ZOrderExprs.spread16(r.getLong(1)) << 1)
      assert(r.getLong(2) == exp, s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("q147: every Z-block is an aligned grid rectangle with tight bounds") {
    // blockShift=6 on an interleaved code ⇒ each block covers an 8×8 tile
    // of the 256×256 grid: per-block min/max must sit inside one tile.
    val rows = SparkEntry.queries("q147_zorder_manifest")(spark, sf).collect()
    assert(rows.nonEmpty)
    val tile = 1 << (Queries.ZBlockShift / 2)
    rows.foreach { r =>
      val (minX, maxX) = (r.getAs[Long]("min_x"), r.getAs[Long]("max_x"))
      val (minY, maxY) = (r.getAs[Long]("min_y"), r.getAs[Long]("max_y"))
      assert(maxX - minX < tile && maxY - minY < tile,
        s"block ${r.getAs[Long]("block")} spans ($minX..$maxX, $minY..$maxY)")
      assert(minX / tile == maxX / tile && minY / tile == maxY / tile,
        s"block ${r.getAs[Long]("block")} crosses a tile boundary")
    }
    // and the manifest accounts for every order
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.orders(spark, sf).count())
  }

  // --- q148: trigram mining ----------------------------------------------

  test("q148: trigram total equals sum over users of max(0, n-2)") {
    val total = SparkEntry.queries("q148_event_trigrams")(spark, sf)
      .agg(sum("n_seq")).collect()(0).getLong(0)
    val expected = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .select(sum(greatest(col("n") - 2, lit(0L)))).collect()(0).getLong(0)
    assert(total == expected)
  }

  // --- q149: range planner -----------------------------------------------

  test("q149: buckets cover all rows and are value-monotone") {
    val rows = SparkEntry.queries("q149_range_plan")(spark, sf)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("bucket")).forall(b => b >= 0 && b < Queries.RangeK))
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.lineitem(spark, sf).count())
    // assignment is monotone in the value ⇒ bucket ranges don't overlap
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_price") <= b.getAs[Double]("min_price"),
          s"bucket ${a.get(0)} overlaps ${b.get(0)}")
      case _ =>
    }
  }

  // --- q150: source similarity matrix ------------------------------------

  test("q150: pair matrix is upper-triangular with jaccard in (0,1]") {
    val rows = SparkEntry.queries("q150_source_similarity")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20 * 19 / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
      assert(r.getAs[Long]("common") >= 1L)
    }
  }

  // --- q151: RRF fusion ---------------------------------------------------

  test("q151: fused ranks are permutations and rrf is the stated formula") {
    val rows = SparkEntry.queries("q151_rrf_fusion")(spark, sf).collect()
    assert(rows.length == Queries.HybridK)
    rows.foreach { r =>
      val exp = 1.0 / (Queries.RrfC + r.getAs[Int]("r_lex")) +
        1.0 / (Queries.RrfC + r.getAs[Int]("r_dense"))
      assert(r.getAs[Double]("rrf") == exp)
    }
    // descending by rrf with doc_id tiebreak
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Double]("rrf") >= b.getAs[Double]("rrf"))
      case _ =>
    }
    // ranks within the candidate pool are distinct
    val lex = rows.map(_.getAs[Int]("r_lex"))
    assert(lex.distinct.length == lex.length)
  }

  // --- q152: FD profile ---------------------------------------------------

  test("q152: key-determined dependencies hold; non-keys fail") {
    val rows = SparkEntry.queries("q152_fd_profile")(spark, sf).collect()
      .map(r => r.getAs[String]("lhs") -> r.getAs[Long]("fd_holds")).toMap
    assert(rows("orders.o_orderkey") == 1L, "primary key must determine custkey")
    assert(rows("customer.c_custkey") == 1L)
    assert(rows("nation.n_nationkey") == 1L)
    assert(rows("orders.o_custkey") == 0L, "customer places many orders")
    assert(rows("events.user_id") == 0L, "a user emits many event types")
  }
}
