package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches and samplers built on the portable affine hash
  * family — unlike engine-native HLL (Spark and DuckDB use different
  * sketch implementations), these produce identical results in both
  * engines, so estimates are oracle-verifiable and stable across reruns
  * and cluster sizes.
  */
object Sketches {

  /** Large prime modulus shared with the LSH family. */
  val P: Long = Lsh.P
  /** Affine mix constants for the sketch hash. */
  val HA: Long = 2654435761L
  val HB: Long = 1013904223L

  /** Portable uniform-ish hash of a long key into [0, P). `pmod`, not
    * `%`: `%` keeps the dividend's sign, so negative keys would emit
    * negative "hashes" that silently corrupt every downstream order
    * statistic / register index. pmod ≡ % on the non-negative domain
    * (oracle arithmetic unchanged) and total on the rest — the same rule
    * the native SketchAggs apply with java.lang.Math.floorMod.
    */
  def keyHash(key: Column): Column = pmod(lit(HA) * key + lit(HB), lit(P))

  /** K-minimum-values distinct-count estimate: with m = the k-th smallest
    * distinct hash (normalized to (0,1]), the estimator is (k-1)/m.
    * One narrow shuffle of hash values; the k-min is a TakeOrdered
    * (per-partition heaps, then a k-sized merge on the driver side of the
    * plan) — scale-independent output size.
    */
  def kmvDistinctEstimate(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.select(keyHash(col(keyCol)).as("h")).distinct()
      .orderBy("h").limit(k)
      .agg(max(col("h")).as("kth"))
      .select(
        lit(k).as("k"),
        (lit((k - 1).toDouble) / (col("kth").cast("double") / lit(P.toDouble)))
          .as("est_distinct"))

  /** Deterministic Bernoulli sample: keep a row iff its content hash lands
    * under `rate`. Reproducible on any cluster/partitioning (no RNG
    * state), and stratified rates per group compose by just varying
    * `rate` per row.
    */
  def hashSampled(hash: Column, rate: Column): Column =
    (hash.cast("double") / lit(P.toDouble)) < rate

  /** Per-group KMV distinct-count estimates — `kmvDistinctEstimate`
    * partitioned: the k-th smallest distinct hash per group comes from a
    * per-group rank over the DISTINCT (group, hash) frame, so the heavy
    * dedup is one hash-agg and the per-group sort runs over distinct
    * hashes only. Groups with fewer than k distinct keys emit no row —
    * at that size the exact count is cheaper than any sketch, which is
    * the correct regime split. Deterministic: the hash is the portable
    * affine family, no RNG.
    */
  def groupedKmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                         k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("h")
    df.select(col(groupCol), keyHash(col(keyCol)).as("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col(groupCol), lit(k).as("k"),
        (lit((k - 1).toDouble) / (col("h").cast("double") / lit(P.toDouble)))
          .as("est_distinct"))
  }

  /** Histogram-sketch per-group quantiles — the one-pass MERGEABLE scale
    * twin of the exact per-group percentile sort: values drop into
    * fixed-width bins (one hash-agg over (group, bin) — map-side
    * combined, one narrow shuffle), the per-group cumulative runs over at
    * most `nBins` tiny rows, and each requested quantile resolves to the
    * unique boundary bin with a linear interpolation inside it. Error is
    * bounded by `binWidth`; memory by `nBins` counts per group.
    *
    * Unlike rank-based sketches (KLL/GK/t-digest), bin counts are
    * ADDITIVE: merging two sketches — two days, two clusters, a
    * streaming state and a batch — is a vector add with NO dependence on
    * merge order, so estimates are bit-identical on any partitioning,
    * retry, or incremental-merge schedule (the q14 partial-agg pattern
    * applies as-is to the (group, bin, cnt) frame). Every arithmetic
    * step is plain IEEE double, so a SQL engine replaying the same
    * formula reproduces the estimates exactly.
    *
    * Output: one row per group with an `est_<q>` column per requested
    * quantile (q rendered with '_' for '.': est_0_5 for the median).
    */
  /** The sketch's bin assignment — public so a STREAMING sink can count
    * (group, bin) pairs per micro-batch and commit the additive partials
    * (e.g. `Snapshots.appendCommit`); `quantilesFromBinCounts` over the
    * summed segments then equals the batch sketch exactly, which is what
    * additive bins buy.
    */
  def binOf(value: Column, binWidth: Double, nBins: Int): Column =
    least(greatest(floor(value / lit(binWidth)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")

  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         binWidth: Double, nBins: Int,
                         qs: Seq[Double]): DataFrame = {
    val counts = df.groupBy(col(groupCol),
        binOf(col(valueCol), binWidth, nBins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    quantilesFromBinCounts(counts, groupCol, "bin", "cnt", binWidth, qs)
  }

  /** Finalize quantile estimates from an already-aggregated (group, bin,
    * cnt) frame — the shared tail of the batch path and any
    * merged-partials path (streaming segments, per-day sketches,
    * cross-cluster unions: sum the counts, then call this).
    */
  def quantilesFromBinCounts(counts: DataFrame, groupCol: String,
                             binCol: String, cntCol: String,
                             binWidth: Double, qs: Seq[Double]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts
      .select(col(groupCol), col(binCol).as("bin"), col(cntCol).as("cnt"))
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    // the boundary bin for q: cumPrev < q·n <= ... <= cum — unique by
    // construction (a bin whose cumPrev already reaches q·n is excluded)
    val sel = cum.crossJoin(broadcast(qs.toDF("q")))
      .filter(col("cum") >= col("q") * col("n") &&
        col("cum") - col("cnt") < col("q") * col("n"))
      .select(col(groupCol), col("q"),
        (lit(binWidth) * (col("bin").cast("double") +
          (col("q") * col("n") - (col("cum") - col("cnt"))) / col("cnt")))
          .as("est"))
    def qName(q: Double) = "est_" + q.toString.replace('.', '_')
    sel.groupBy(groupCol).agg(
      max(when(col("q") === qs.head, col("est"))).as(qName(qs.head)),
      qs.tail.map(q =>
        max(when(col("q") === q, col("est"))).as(qName(q))): _*)
  }

  // --- Count-min sketch ------------------------------------------------------

  /** CMS row hashes from the shared affine family: row d's bucket for a
    * key with portable fingerprint `fp` (∈ [0, P)) is
    * ((A(d)·fp + B(d)) mod P) mod width. All operands stay below 2^63
    * (A, fp < P ≈ 2^30), every step is integer — identical in any engine.
    */
  def cmsBucket(fp: Column, d: Int, width: Int): Column =
    // inner pmod keeps the bucket total on out-of-range (negative)
    // fingerprints — ≡ % on the documented [0, P) domain; the outer %
    // then operates on a provably non-negative value
    pmod(lit(Lsh.A(d)) * fp + lit(Lsh.B(d)), lit(P)) % lit(width)

  /** Count-min sketch counters over a key column: `depth × width` integer
    * cells as a (d, bucket, cnt) frame — ONE pass over the data (each row
    * fans out to `depth` cells, collapsed map-side), fixed O(depth·width)
    * output whatever the key cardinality. Like the histogram sketch the
    * cells are ADDITIVE: merging days/shards/streaming batches is a
    * vector add with no order sensitivity, so a per-batch-committed
    * stream sums to exactly the batch sketch. `keyFpCol` must be the
    * portable polynomial fingerprint of the key (VectorExprs
    * .polyFingerprint), which the SQL twin reproduces.
    */
  def cmsCounters(df: DataFrame, keyFpCol: Column,
                  depth: Int, width: Int): DataFrame =
    df.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(keyFpCol, d, width).as("bucket"))): _*))
        .as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-depth inner products of two CMS counter frames — the classic
    * sketch join-cardinality estimator (AMS/CM inner product):
    * |A ⋈_k B| = Σ_k f_A(k)·f_B(k) ≤ Σ_b a_d[b]·b_d[b] for every depth
    * row d, so min over d is the tightest upper bound the sketches
    * support. Everything is additive integer algebra (counters are
    * counts; the product sum fits int64 up to n_A·n_B < 2^63), so the
    * estimate — the optimizer statistic that prices a join WITHOUT
    * running it — is bit-identical in any engine and mergeable across
    * shards exactly like the counters themselves. Cost: one join of two
    * O(depth·width) frames — independent of data size.
    */
  def cmsInnerProducts(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.withColumnRenamed("cnt", "cnt_b"), Seq("d", "bucket"))
      .groupBy("d")
      .agg(sum(col("cnt") * col("cnt_b")).as("dot"))

  // --- HyperLogLog -----------------------------------------------------------

  /** Bits of the HLL rho domain: `keyHash` values are < P, registers take
    * the low log2(m) bits, and the remaining value (`h >> log2(m)`) fits
    * in W bits. rho ∈ [1, W] for nonzero rests, W+1 for zero — so every
    * 2^−rho term's exponent stays within W+1 ≪ 52 bits and float sums of
    * the terms are EXACT (order-independent), which is what makes the
    * estimate oracle-verifiable.
    */
  def hllRestBits(m: Int): Int = {
    val maxRest = (P - 1) / m
    var w = 0
    while ((1L << w) <= maxRest) w += 1
    w
  }

  private def log2Exact(m: Int): Int = {
    require(m > 1 && (m & (m - 1)) == 0, s"HLL register count must be a power of two, got $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** Nonlinear portable hash for HLL. The affine family is equidistributed
    * — exactly what KMV's order statistic needs — but LINEAR: on
    * sequential keys the high bits of (A·k+B) mod P form an arithmetic
    * progression and the leading-zero statistic is badly non-geometric
    * (measured est_ratio 0.61–1.86 on the fixtures). Cubing mod P is a
    * BIJECTION (gcd(3, P−1) = 1 for P = 1e9+7) with enough algebraic
    * avalanche for rho (measured 0.92–1.11). Every operand stays below
    * 2^60 (h < 2^30; h² < 2^60; (h² mod P)·h < 2^60) — exact integer ops
    * in any engine.
    */
  def hllHash(key: Column): Column = {
    val h = keyHash(key)
    ((h * h) % lit(P) * h) % lit(P)
  }

  /** rho = leading-zero count + 1 of the W-bit rest, as a CASE cascade of
    * integer threshold compares — portable to any SQL engine verbatim (no
    * float log2, whose rounding at exact-power boundaries is libm
    * lottery).
    */
  def hllRho(rest: Column, w: Int): Column = {
    val first: Column = when(rest >= lit(1L << (w - 1)), lit(1))
    (2 to w).foldLeft(first)((c, r) =>
        c.when(rest >= lit(1L << (w - r)), lit(r)))
      .otherwise(lit(w + 1)).cast("int")
  }

  /** The same cascade as SQL text (for the DuckDB oracle twin). */
  def hllRhoSql(rest: String, w: Int): String = {
    val whens = (1 to w)
      .map(r => s"WHEN ($rest) >= ${1L << (w - r)} THEN $r").mkString(" ")
    s"CAST(CASE $whens ELSE ${w + 1} END AS INT)"
  }

  /** Dense HLL register table over a long key column: one row per
    * register index in [0, m) with the max rho of the keys landing there
    * (0 for untouched registers). ONE hash-agg pass, O(m) output
    * whatever the key cardinality; registers MERGE across shards, days,
    * clusters, or streaming batches by per-index MAX — idempotent and
    * order-free (max dominates), so re-delivered batches cannot corrupt
    * the sketch and a per-batch-committed stream folds to exactly the
    * batch registers.
    */
  def hllRegisters(df: DataFrame, key: Column, m: Int): DataFrame = {
    val p = log2Exact(m)
    val w = hllRestBits(m)
    val h = hllHash(key)
    val sparse = df
      .select((h % lit(m.toLong)).as("idx"), hllRho(shiftright(h, p), w).as("rho"))
      .groupBy("idx").agg(max(col("rho")).as("rho"))
    df.sparkSession.range(m).select(col("id").as("idx"))
      .join(sparse, Seq("idx"), "left")
      .select(col("idx"), coalesce(col("rho"), lit(0)).as("rho"))
  }

  /** Per-group dense registers: `hllRegisters` partitioned by a group
    * column — the grid is groups × m, built from the DISTINCT group set.
    */
  def groupedHllRegisters(df: DataFrame, groupCol: String, key: Column,
                          m: Int): DataFrame = {
    val p = log2Exact(m)
    val w = hllRestBits(m)
    val h = hllHash(key)
    // ONE scan of the input: sparse max-rho registers per (group, idx),
    // rolled up into a per-group map (≤ m entries), then densified by
    // exploding a literal 0..m-1 sequence against that map. The earlier
    // form derived the group set with a second `df.select(groupCol)
    // .distinct()` scan plus a grid join-back — at 100 TB that reads the
    // corpus twice for a sketch whose whole point is a single pass.
    df.select(col(groupCol), (h % lit(m.toLong)).as("idx"),
        hllRho(shiftright(h, p), w).as("rho"))
      .groupBy(col(groupCol), col("idx")).agg(max(col("rho")).as("rho"))
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("rho"))))
        .as("__regs"))
      .select(col(groupCol), explode(expr(
        s"transform(sequence(0L, ${m - 1}L), " +
          "i -> struct(i AS idx, coalesce(element_at(__regs, i), 0) AS rho))"))
        .as("__r"))
      .select(col(groupCol), col("__r.idx").as("idx"), col("__r.rho").as("rho"))
  }

  /** α_m of the standard raw estimator (m ≥ 128 form). Computed once in
    * Scala and embedded as the same double literal in both engines.
    */
  def hllAlpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** Raw HLL estimate α_m·m²/Σ2^−rho over dense registers, appended as
    * `estCol` to per-`keyCols` rows (empty keyCols = one global row).
    * Every 2^−rho is an exact power of two (integer shift, then one
    * exact division), partial sums are exact, α_m is a shared literal —
    * so the estimate is bit-identical across engines and partitionings.
    * RAW regime only (n ≳ 2.5m): the small-range linear-counting
    * correction needs ln(), whose last-ulp behavior is engine-specific —
    * below the raw regime use KMV (exact cross-engine) instead.
    */
  /** α_m·m² as ONE double constant — computed here and embedded
    * identically in the SQL twin (Double round-trips through its decimal
    * string), so both engines divide the same numerator by the same
    * exact register sum.
    */
  def hllNumerator(m: Int): Double = hllAlpha(m) * m.toDouble * m.toDouble

  def hllEstimate(regs: DataFrame, keyCols: Seq[String], m: Int,
                  estCol: String): DataFrame = {
    val term = expr("1.0 / cast(shiftleft(cast(1 as bigint), rho) as double)")
    val base = if (keyCols.isEmpty) regs.agg(sum(term).as("__z"))
      else regs.groupBy(keyCols.map(col): _*).agg(sum(term).as("__z"))
    base.withColumn(estCol, lit(hllNumerator(m)) / col("__z"))
      .drop("__z")
  }

  /** Point-estimate lookup: each item's count estimate is the MIN over
    * the depth rows of its bucket's counter — the classic CMS guarantee
    * (estimate >= true count; error <= ε·N with prob 1−δ at width=e/ε,
    * depth=ln(1/δ)). `items` is expected to be small (a head/candidate
    * set); the counter frame is depth×width rows and broadcasts.
    */
  def cmsEstimates(items: DataFrame, keyFpCol: Column, counters: DataFrame,
                   depth: Int, width: Int, estCol: String): DataFrame = {
    val probes = items.withColumn("__db",
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), cmsBucket(keyFpCol, d, width).as("bucket"))): _*)))
      .select(items.columns.map(col) :+ col("__db.d").as("d") :+
        col("__db.bucket").as("bucket"): _*)
    probes.join(broadcast(counters), Seq("d", "bucket"))
      .groupBy(items.columns.map(col): _*)
      .agg(min(col("cnt")).as(estCol))
  }
}
