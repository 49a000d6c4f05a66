package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder

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
