package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic reporting operators beyond plain grouped aggregation: pivots,
  * share-of-total windows, and rolling time windows — the gold-layer
  * report shapes the reference's analytics notebooks produce.
  *
  * Determinism policy: every windowed SUM that feeds output runs over
  * exact decimals (order-independent) and converts to double only at the
  * edge — window partitions have no deterministic row order, so summing
  * doubles inside a window would be partitioning-dependent.
  */
object Analytics {

  /** Pivot `pivotCol` (with the explicit `values` domain — explicit so the
    * plan is static and scale-safe) into per-value count columns named
    * `<prefix><value>`. Missing combinations are 0, not null.
    */
  def pivotCounts(df: DataFrame, groupCol: String, pivotCol: String,
                  values: Seq[String], prefix: String): DataFrame = {
    val pivoted = df.groupBy(col(groupCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
    val renamed = values.foldLeft(pivoted)((d, v) =>
      d.withColumnRenamed(v, s"$prefix${v.toLowerCase}"))
    renamed.na.fill(0L, values.map(v => s"$prefix${v.toLowerCase}"))
  }

  /** Each group's share of its partition total. `valueCol` must be an
    * exact decimal column; the share is an IEEE division of the two
    * decimal-exact values cast to double.
    */
  def shareOfTotal(df: DataFrame, partitionCols: Seq[String],
                   valueCol: String): Column = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
    col(valueCol).cast("double") / sum(col(valueCol)).over(w).cast("double")
  }

  /** Rolling sum over the trailing `days`-day window (inclusive of the
    * current day), keyed on a days-since-epoch column. Scale note: a
    * global time-ordered range window sorts one partition; at 100 TB,
    * partition by a coarse time bucket and stitch boundary days.
    */
  def rollingSumDays(dayNumCol: String, valueCol: String, days: Int): Column =
    sum(col(valueCol))
      .over(Window.orderBy(col(dayNumCol)).rangeBetween(-(days - 1), 0))

  /** Within-basket item co-occurrence counts — the market-basket /
    * "users who bought X also bought Y" support table. Distinct
    * (basket, item) first (repeat lines must not double-count), then a
    * per-basket self-join with `item_a < item_b` so each unordered pair
    * counts once per basket. The join fans out as the basket size
    * SQUARED, so the bound is ENFORCED here, not delegated: baskets with
    * more than `maxBasketSize` distinct items are quarantined whole (a
    * real order has dozens of lines; a "basket" with 10^4 items is a
    * bot/crawler whose 10^8 pairs would be one straggler task that never
    * finishes at 100 TB — and its "co-occurrences" are noise, not
    * signal). The size count is a window over the same __basket
    * hash-partitioning the self-join needs, so the guard reuses that
    * exchange instead of adding one. With the bound in force the whole
    * shape is two hash shuffles on uniform keys and per-task work is
    * ≤ maxBasketSize² per basket by construction.
    */
  def coOccurrencePairs(df: DataFrame, basketCol: String, itemCol: String,
                        minSupport: Long,
                        maxBasketSize: Long = 1000L): DataFrame = {
    require(maxBasketSize >= 2, "maxBasketSize below 2 yields no pairs")
    val items = df.select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
      .withColumn("__bsize",
        count(lit(1)).over(Window.partitionBy(col("__basket"))))
      .filter(col("__bsize") <= maxBasketSize)
      .drop("__bsize")
    val a = items.alias("a")
    val b = items.alias("b")
    a.join(b, col("a.__basket") === col("b.__basket") &&
        col("a.__item") < col("b.__item"))
      .groupBy(col("a.__item").as("item_a"), col("b.__item").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }

  /** Sliding `windowDays`-day distinct-entity count per window end —
    * rolling DAU/WAU-style reach — WITHOUT a day-range join or a growing
    * distinct state: each distinct (entity, day) contributes to at most
    * `windowDays` window ends, so it explodes to exactly those, a second
    * hash-dedup collapses entities active on several days of one window,
    * and a count per window end remains. Cost is O(distinct rows ×
    * windowDays) with every shuffle on uniform hash keys — the bounded
    * fan-out decomposition of a sliding COUNT(DISTINCT), same family as
    * q74's running-distinct rewrite. Window ends with no activity on the
    * end day itself are dropped (left-semi against observed days), which
    * keeps the output domain = the observed days.
    */
  def slidingDistinctCount(df: DataFrame, entityCol: String, dayCol: String,
                           windowDays: Int, outCol: String): DataFrame = {
    val ud = df.select(col(entityCol).as("__e"), col(dayCol).as("__d")).distinct()
    val days = ud.select(col("__d").as("window_end")).distinct()
    ud.select(col("__e"),
        explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1)))
          .as("window_end"))
      .distinct()
      .join(days, Seq("window_end"), "left_semi")
      .groupBy("window_end")
      .agg(count(lit(1)).as(outCol))
  }

  /** Calendar densification + forward fill over a sparse per-key daily
    * frame: every key gets a row for EVERY day of the global [min, max]
    * span, gap days carry the key's most recent observed value. The fill
    * uses the gap-and-island trick — a running COUNT of non-null values
    * assigns each gap row to the island opened by the last observation,
    * and MAX over (key, island) recovers that observation — instead of
    * `last(ignoreNulls)` whose frame-walk cost is quadratic in gap length
    * on some engines and which has no ANSI twin. Scale: the dense frame
    * is O(keys × span-days) — a report-sized output (the INPUT fact table
    * was already aggregated to daily rows); the per-key windows
    * hash-distribute by key. Value column must be exact (decimal/long) so
    * MAX is order-independent. Days before a key's first observation stay
    * null (nothing to carry). Returns the dense frame with `valCol` (null
    * on gaps), `filled_<valCol>` (carried), and `is_gap`.
    */
  def gapFillForward(daily: DataFrame, keyCol: String, dayCol: String,
                     valCol: String): DataFrame = {
    val span = daily.agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val wIsland = Window.partitionBy(col(keyCol), col("__island"))
    grid.join(daily, Seq(keyCol, dayCol), "left")
      .withColumn("__island", count(col(valCol)).over(wRun))
      .withColumn(s"filled_$valCol", max(col(valCol)).over(wIsland))
      .withColumn("is_gap", col(valCol).isNull)
      .drop("__island")
  }

  /** Calendar densification + LINEAR interpolation — the resampling rule
    * for series where a gap means "not measured", not "zero" (sensor
    * feeds, sparse pricing): each missing day gets
    * v = prev + (next − prev) · (d − d_prev)/(d_next − d_prev), from the
    * SURROUNDING observations (forward fill, [[gapFillForward]], answers
    * the as-of question instead). Leading/trailing gaps — no observation
    * on one side — stay null: extrapolation is a modeling decision, not
    * a fill. Exactness: the exact-decimal observations cast to double
    * once, the day ratio is an int÷int double division, and the single
    * a + (b−a)·t expression is evaluated in one fixed shape — bit-equal
    * in any engine. Cost: the same grid join + four running windows over
    * the per-key frames; at 100 TB the frame is O(keys × span-days),
    * already aggregated — tiny next to the fact scan that produced it.
    */
  def gapFillLinear(daily: DataFrame, keyCol: String, dayCol: String,
                    valCol: String): DataFrame = {
    val span = daily.agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
    val wFwd = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val wBwd = Window.partitionBy(col(keyCol)).orderBy(col(dayCol).desc)
    val obsDay = when(col(valCol).isNotNull, col(dayCol))
    grid.join(daily, Seq(keyCol, dayCol), "left")
      .withColumn("__pv", last(col(valCol), ignoreNulls = true).over(wFwd))
      .withColumn("__pd", last(obsDay, ignoreNulls = true).over(wFwd))
      .withColumn("__nv", last(col(valCol), ignoreNulls = true).over(wBwd))
      .withColumn("__nd", last(obsDay, ignoreNulls = true).over(wBwd))
      .withColumn(s"interp_$valCol",
        when(col(valCol).isNotNull, col(valCol).cast("double"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv").cast("double") +
              (col("__nv").cast("double") - col("__pv").cast("double")) *
              (datediff(col(dayCol), col("__pd")).cast("double") /
                datediff(col("__nd"), col("__pd")).cast("double"))))
      .withColumn("is_gap", col(valCol).isNull)
      .drop("__pv", "__pd", "__nv", "__nd")
  }

  /** Cramér's V association strength between two categorical columns —
    * the log-free cousin of mutual information (MI needs ln(), whose
    * last-ulp behavior is libm lottery; chi-square is +,×,÷ and one
    * sqrt, all IEEE-deterministic). Cell counts are exact longs over ONE
    * hash-agg; the contingency grid is DENSIFIED (distinct-a × distinct-b
    * with zero fill) because absent combinations contribute (0−e)²/e = e
    * to the chi-square — dropping them understates association exactly
    * when it's strongest. Expected cells (ra·cb)/n stay below 2^53 so
    * the doubles are exact; per-cell terms fold in FIXED (a, b) order
    * via sort_array+aggregate (a partition-ordered double SUM would be
    * nondeterministic). Output one row: n_rows, nr, nc, chi2, cramers_v.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val grid = cells.select("a").distinct()
      .crossJoin(cells.select("b").distinct())
    val dense = grid.join(cells, Seq("a", "b"), "left").na.fill(0L, Seq("o"))
    val ra = cells.groupBy("a").agg(sum("o").as("ra"))
    val cb = cells.groupBy("b").agg(sum("o").as("cb"))
    val nn = cells.agg(sum("o").as("n"),
      countDistinct("a").as("nr"), countDistinct("b").as("nc"))
    val e = (col("ra") * col("cb")).cast("double") / col("n").cast("double")
    dense.join(ra, "a").join(cb, "b").crossJoin(broadcast(nn))
      .select(col("a"), col("b"), col("n"), col("nr"), col("nc"),
        ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
          .as("term"))
      .groupBy("n", "nr", "nc")
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("term"))))
        .as("ts"))
      .select(col("n").cast("long").as("n_rows"), col("nr"), col("nc"),
        expr("aggregate(ts, cast(0.0 as double), (acc, x) -> acc + x.term)")
          .as("chi2"))
      .withColumn("cramers_v",
        sqrt(col("chi2") / (col("n_rows").cast("double") *
          least(col("nr") - 1, col("nc") - 1).cast("double"))))
  }

  /** Trailing-window z-score anomaly columns over a daily frame: for each
    * day, mean/variance of `valueLongCol` (an INTEGER-quantized metric —
    * the caller picks units coarse enough that Σv and Σv² stay below
    * 2^53, e.g. kilodollars for revenue; the q42/q70 quantize-then-moment
    * recipe) over the `days` days strictly BEFORE it (RANGE on
    * `dayNumCol`), and the z-score of the day's value against that
    * trailing baseline. Integer window sums are exact and convert to
    * double exactly, so the fixed-shape mean/var/z doubles are
    * bit-stable across partitionings and engines — no decimal→double
    * rounding ever happens. Days with fewer than `minPrior` trailing
    * observations (or zero variance) get a null z. The window rides the
    * already-aggregated daily frame — O(days) rows — so the
    * unpartitioned RANGE window is a deliberately tiny task, as in
    * `rollingSumDays`.
    */
  def trailingZScore(daily: DataFrame, dayNumCol: String, valueLongCol: String,
                     days: Int, minPrior: Int): DataFrame = {
    val w = Window.orderBy(col(dayNumCol)).rangeBetween(-days, -1)
    val withStats = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col(valueLongCol)).over(w))
      .withColumn("__ss", sum(col(valueLongCol) * col(valueLongCol)).over(w))
    val n = col("__n").cast("double")
    val s = col("__s").cast("double")
    val mean = s / n
    val variance = (col("__ss").cast("double") - s * s / n) / (n - lit(1.0))
    withStats
      .withColumn("n_prior", col("__n"))
      .withColumn("trailing_mean", when(col("__n") >= minPrior, mean))
      .withColumn("z_score",
        when(col("__n") >= minPrior && variance > lit(0.0),
          (col(valueLongCol).cast("double") - mean) / sqrt(variance)))
      .drop("__n", "__s", "__ss")
  }
}
