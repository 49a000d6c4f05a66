package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of (point-in-time) join: for every left row, attach the
  * latest right row of the same key with `right.ts <= left.ts` — the
  * time-series join Spark has no native operator for (attribution,
  * last-known-state enrichment, SCD2 consumption without intervals).
  *
  * Implementation: the union+window technique — both sides are tagged and
  * unioned, sorted per key by (ts, side) with right rows first at equal
  * timestamps (inclusive semantics), and each right attribute is carried
  * forward with `last(_, ignoreNulls)` over the running frame. ONE shuffle
  * on the key and one per-key sort, independent of how many right rows
  * precede each left row — versus the naive inequality join, which is a
  * per-key cross product. This is also the plan shape that survives skew:
  * the window is the same machinery as SCD2.
  *
  * Precondition: right rows are unique per (keys, ts) — callers dedup
  * with `Dedup.latestByKey` first (ties otherwise make any engine's
  * choice arbitrary).
  */
object AsOf {

  /** Left rows + `rightCols` (each renamed with `prefix`) from the as-of
    * matched right row; null when no right row precedes.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Seq[String], prefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideCol = "__side"
    val l = rightCols.foldLeft(left.withColumn(sideCol, lit(1)))(
      (d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r0 = right.select((keys :+ tsCol).map(col) ++ rightCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn(sideCol, lit(0))
    val r = leftCols.filterNot((keys :+ tsCol).contains)
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = rightCols.foldLeft(unioned)((d, c) =>
      d.withColumn(s"$prefix$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    attributed.filter(col(sideCol) === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"$prefix$c")): _*)
  }
}
