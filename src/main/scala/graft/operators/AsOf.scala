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
    * matched right row; null when no right row qualifies.
    *
    * `forward = false` (default) matches the LATEST right row with
    * `right.ts <= left.ts`; `forward = true` matches the EARLIEST right
    * row with `right.ts >= left.ts` (next-event attribution — time to
    * conversion, next price tick). Both are inclusive at equal
    * timestamps.
    *
    * `toleranceMicros` bounds the match distance (pandas merge_asof's
    * `tolerance`): a match farther than the bound — stale state, an
    * expired attribution window — comes back as nulls instead, exactly
    * as if no right row qualified. The bound is applied AFTER the
    * window carry, so the plan cost is unchanged: still one shuffle on
    * the key and one per-key sort, never a per-key cross product.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Seq[String], prefix: String = "r_",
               toleranceMicros: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // Collision-proof sentinels: "__r_ts" would collide with the renamed
    // right column when the caller puts the ts column itself in
    // `rightCols` (a natural ask — "return the matched row's timestamp"),
    // making the left/right union branches disagree on its type. Pick
    // names fresh against every column either branch will carry.
    val taken = (leftCols ++ right.columns ++ rightCols.map(c => s"__r_$c")).toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !taken(n)).get
    val sideCol = fresh("__side")
    val rtsCol = fresh("__graft_asof_rts")
    // The carry columns are named by prefixing, so the prefix must not be
    // a prefix of ANY existing column (withColumn would replace it).
    val mPrefix = Iterator.from(0)
      .map(i => if (i == 0) "__m_" else s"__m${i}_")
      .find(p => !taken.exists(_.startsWith(p))).get
    val l = rightCols.foldLeft(left.withColumn(sideCol, lit(1)))(
      (d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
      .withColumn(rtsCol, lit(null).cast("long"))
    val r0 = right.select((keys :+ tsCol).map(col) ++ rightCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn(sideCol, lit(0))
      .withColumn(rtsCol, unix_micros(col(tsCol)))
    val r = leftCols.filterNot((keys :+ tsCol).contains)
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.unionByName(r)
    // forward = the same carry over the REVERSED time order; right rows
    // sort before left at equal ts either way (side 0 < 1 — inclusive)
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightCols.map(c => s"__r_$c") :+ rtsCol).foldLeft(unioned)(
      (d, c) => d.withColumn(s"$mPrefix$c", last(col(c), ignoreNulls = true).over(w)))
    val dist =
      if (forward) col(s"$mPrefix$rtsCol") - unix_micros(col(tsCol))
      else unix_micros(col(tsCol)) - col(s"$mPrefix$rtsCol")
    // null matched-ts makes `within` null, and when() treats null as
    // false — unmatched rows stay null-padded with no extra branch
    val within = toleranceMicros.fold(lit(true))(t => dist <= lit(t))
    carried.filter(col(sideCol) === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => when(within, col(s"${mPrefix}__r_$c")).as(s"$prefix$c")): _*)
  }
}
