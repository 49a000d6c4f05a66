package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Scc, ZOrder}

/** Round-14 contracts. q230 Hilbert write path: the probe scan must
  * prune at the partition-directory level (PartitionFilters on hblock
  * in the executed plan) and the manifest-derived block list must be a
  * STRICT subset of the occupied blocks — otherwise the "layout" is a
  * full scan with extra steps.
  */
class Round14Spec extends AnyFunSuite {
  import TestSession._

  test("q230: probe scan prunes hilbert block partitions in the plan") {
    val df = SparkEntry.queries("q230_hilbert_layout")(spark, sf)
    df.collect() // run once (writes the layout, finalizes AQE)
    val p = df.queryExecution.executedPlan.toString
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(m.isDefined, s"no PartitionFilters in scan:\n$p")
    assert(m.get.group(1).contains("hblock"),
      s"hblock list must reach the partition filter: ${m.get.group(1)}")
  }

  test("q230: manifest probe intersection reads strictly fewer blocks than the layout holds") {
    val path = s"${TestSession.tempDir("graft_hilw_spec")}/orders_h"
    val orders = Tables.orders(spark, sf)
      .withColumn("day",
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long"))
    ZOrder.writeHilbertLayout(orders, col("o_custkey"), col("day"), path,
      Queries.ZQBits, Queries.ZBlockShift)
    val man = spark.read.parquet(path + "_manifest")
    val total = man.count()
    val hit = man.filter(
      ZOrder.quantize(lit(Queries.HilXLo), col("minx"), col("maxx"),
        Queries.ZQBits) <= col("max_x") &&
        col("min_x") <= ZOrder.quantize(lit(Queries.HilXHi), col("minx"),
          col("maxx"), Queries.ZQBits) &&
        ZOrder.quantize(lit(Queries.HilDayLo), col("miny"), col("maxy"),
          Queries.ZQBits) <= col("max_y") &&
        col("min_y") <= ZOrder.quantize(lit(Queries.HilDayHi), col("miny"),
          col("maxy"), Queries.ZQBits)).count()
    assert(hit > 0, "probe must intersect at least one block")
    assert(hit < total,
      s"probe must prune: $hit of $total blocks — the manifest gives no skipping")
    // the manifest's row accounting covers the written data exactly
    val manRows = man.agg(sum("n_rows")).collect()(0).getLong(0)
    val dataRows = spark.read.parquet(path).count()
    assert(manRows == dataRows,
      s"manifest rows $manRows != written rows $dataRows")
  }

  test("q231: the generalized weighted median equals q196's inline decomposition bit-for-bit") {
    val twin = SparkEntry.queries("q231_weighted_median_decomposed")(spark, sf)
    val inline = SparkEntry.queries("q196_weighted_median")(spark, sf)
    assert(twin.exceptAll(inline).isEmpty && inline.exceptAll(twin).isEmpty)
  }

  test("groupedWeightedMedian ignores NULL values and weights, exact on a hand fixture") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double, java.lang.Long)](
      ("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 1L), // tw=4, crossing at 2.0
      ("a", null, 9L), ("a", 5.0, null),              // both ignored
      ("b", 10.0, 1L)).toDF("g", "v", "w")
    val got = graft.operators.Median
      .groupedWeightedMedian(df, "g", "v", "w", "wm")
      .orderBy("g").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 4L, 2.0), ("b", 1L, 10.0)))
  }

  // --- q233: collocation spans -------------------------------------------------------

  test("collocationSpans surfaces the planted trigram across rounds (hand-computed lifts)") {
    import spark.implicits._
    val docs = Seq(
      "a new york city b",
      "c new york city d",
      "e new york city f").toDF("text")
    val got = graft.operators.Collocations
      .collocationSpans(spark, docs, col("text"), rounds = 2,
        minMarginal = 1L, minPair = 2L)
      .collect()
    assert(got.length == 2)
    val r1 = got(0)
    // 12 slots; (new,york) and (york,city) both lift 3·12/(3·3) = 4 —
    // the quantized keys tie, (a,b) lexicographic picks (new,york)
    assert((r1.getInt(0), r1.getString(1), r1.getString(2), r1.getLong(3),
      r1.getDouble(4)) == ((1, "new", "york", 3L, 4.0)))
    val r2 = got(1)
    // after the merge: 9 slots, ("new york", city) count 3, lift 3·9/9
    assert((r2.getInt(0), r2.getString(1), r2.getString(2), r2.getLong(3),
      r2.getDouble(4)) == ((2, "new york", "city", 3L, 3.0)))
  }

  // --- q232: SCC -------------------------------------------------------------------

  test("Scc.components solves a hand-computed bow-tie exactly") {
    import spark.implicits._
    // two 3-cycles bridged one-way, a tendril chain off the second
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),     // SCC {1,2,3}
      (4L, 5L), (5L, 6L), (6L, 4L),     // SCC {4,5,6}
      (3L, 4L),                         // one-way bridge
      (6L, 7L), (7L, 8L)                // tendril: singletons {7},{8}
    ).toDF("src", "dst")
    val got = Scc.components(edges).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 8L))
  }

  test("Scc.components: two disjoint replicas equal two independent runs") {
    val li = Tables.lineitem(spark, sf)
      .filter(pmod(col("l_orderkey"), lit(Queries.SccOrderMod.toLong)) === 0)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val a = li.alias("a")
    val b = li.alias("b")
    val ed = a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
        col("b.l_linenumber") === col("a.l_linenumber") + 1)
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val off = 1000000L
    val two = ed.unionByName(
      ed.select((col("src") + off).as("src"), (col("dst") + off).as("dst")))
    val single = Scc.components(ed)
    val both = Scc.components(two)
    val expected = single.select(col("node"), col("scc_id"))
      .unionByName(single.select((col("node") + off).as("node"),
        (col("scc_id") + off).as("scc_id")))
    assert(both.exceptAll(expected).isEmpty && expected.exceptAll(both).isEmpty,
      "replica labels must equal two independent runs (offset-shifted)")
  }

  test("Scc.components fails fast when the outer cap binds (no plausible partial labels)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Scc.components(edges, maxOuterRounds = 1).collect()
    }
    ()
  }

  test("Scc.components on an empty edge set returns an empty labeled frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Scc.components(empty)
    assert(got.columns.toSeq == Seq("node", "scc_id") && got.count() == 0)
  }

  test("q230: hive layout partitions blocks on disk (one dir per occupied block)") {
    val path = s"${TestSession.tempDir("graft_hilw_dirs")}/orders_h"
    val orders = Tables.orders(spark, sf)
      .withColumn("day",
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long"))
    ZOrder.writeHilbertLayout(orders, col("o_custkey"), col("day"), path,
      Queries.ZQBits, Queries.ZBlockShift)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("hblock="))
      .map(_.getName.stripPrefix("hblock=").toLong).sorted
    val manBlocks = spark.read.parquet(path + "_manifest")
      .select("hblock").collect().map(_.getLong(0)).sorted
    assert(dirs.sameElements(manBlocks),
      "partition directories and manifest blocks must agree")
  }
}
