package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.ZOrderExprs

/** Z-order (Morton-curve) data layout planner.
  *
  * The write-side half of multi-dimensional file skipping: quantize two
  * layout dimensions to a fixed grid, interleave the grid coordinates
  * into a Morton code (graft.plans.ZOrderExprs — codegen'd integer
  * kernel), and treat contiguous Z-ranges as the target files. The
  * resulting per-file manifest carries min/max for BOTH dimensions, and
  * because a Z-range is a small rectangle in (x, y) space those bounds
  * are tight — a point/range predicate on either dimension prunes most
  * files, which is the entire economics of a 100 TB scan.
  *
  * Scale shape: the quantization bounds are one scalar aggregate
  * (broadcast back — O(1) rows); the Morton code is map-side codegen;
  * the manifest is one hash-aggregation over O(blocks) groups. To
  * actually LAY OUT the data at scale you'd `repartitionByRange(zCol)`
  * and write — the manifest produced here is exactly the zone-map index
  * that layout would publish. Reference analog: the medallion tables'
  * partition-by-date layout (Ch3rry-Pi3-Data-Engineering notebooks write
  * date-partitioned silver tables); Z-order generalizes that to two
  * dimensions with bounded file counts.
  */
object ZOrder {

  /** Quantize `v` (long) into `2^qBits` equal-width buckets of
    * [lo, hi]: `floor((v-lo) * 2^qBits / (hi-lo+1))`. The division runs
    * in double but both operands are exact integers far below 2^53 and
    * the true quotient is a rational with denominator ≤ range, so the
    * floor is exact — bit-identical to integer `//` in the oracle.
    */
  def quantize(v: Column, lo: Column, hi: Column, qBits: Int): Column =
    floor(((v - lo) * lit(1L << qBits)) / (hi - lo + lit(1L))).cast("long")

  /** Per-Z-block layout manifest for `df` laid out on (xCol, yCol).
    *
    * Output: (block, n_rows, min_x, max_x, min_y, max_y) in quantized
    * grid coordinates, one row per occupied Z-block of `2^blockShift`
    * consecutive Z-values (an aligned rectangle of the grid).
    */
  def layoutManifest(df: DataFrame, xCol: Column, yCol: Column,
                     qBits: Int = 8, blockShift: Int = 6): DataFrame = {
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val bounds = base.agg(min("x").as("minx"), max("x").as("maxx"),
      min("y").as("miny"), max("y").as("maxy"))
    base.crossJoin(broadcast(bounds))
      .select(
        quantize(col("x"), col("minx"), col("maxx"), qBits).as("bx"),
        quantize(col("y"), col("miny"), col("maxy"), qBits).as("by"))
      .withColumn("z", ZOrderExprs.morton16(col("bx"), col("by")))
      .groupBy(shiftright(col("z"), blockShift).as("block"))
      .agg(count(lit(1)).as("n_rows"),
        min("bx").as("min_x"), max("bx").as("max_x"),
        min("by").as("min_y"), max("by").as("max_y"))
      .orderBy("block")
  }

  /** `layoutManifest` on the HILBERT curve (plans/HilbertExprs): same
    * quantize → index → block zone map, with the curve that never takes
    * the Z-curve's diagonal jumps — every block of 2^blockShift
    * consecutive indices is a spatially compact region, so the
    * per-block min/max bounds are uniformly tight (the reason layout
    * engines offer Hilbert next to ZORDER for 100-TB file skipping).
    */
  def hilbertLayoutManifest(df: DataFrame, xCol: Column, yCol: Column,
                            qBits: Int = 8, blockShift: Int = 6): DataFrame = {
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val bounds = base.agg(min("x").as("minx"), max("x").as("maxx"),
      min("y").as("miny"), max("y").as("maxy"))
    base.crossJoin(broadcast(bounds))
      .select(
        quantize(col("x"), col("minx"), col("maxx"), qBits).as("bx"),
        quantize(col("y"), col("miny"), col("maxy"), qBits).as("by"))
      .withColumn("h", graft.plans.HilbertExprs.hilbert(col("bx"), col("by"), qBits))
      .groupBy(shiftright(col("h"), blockShift).as("block"))
      .agg(count(lit(1)).as("n_rows"),
        min("bx").as("min_x"), max("bx").as("max_x"),
        min("by").as("min_y"), max("by").as("max_y"))
      .orderBy("block")
  }
}
