package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter pattern behind
  * every petabyte-scale selective join: build a compact bitmap of the
  * small (filtered) side's join keys, push a cheap membership test into
  * the big side's scan so non-matching rows die before the shuffle, then
  * run the exact join on the survivors. The bloom pass is
  * semantics-neutral (false positives are removed by the exact join;
  * false negatives are impossible), so results are bit-identical to the
  * plain semi-join — which is exactly what the oracle checks.
  *
  * Spark's AQE injects a similar runtime filter on its own when
  * statistics justify it; this operator makes the plan explicit and
  * tunable (bit width, hash count) for the cases AQE misses — e.g. a
  * build side just over the broadcast threshold, or a pre-shuffle scan
  * reduction ahead of a sort-merge join where the filter pays for itself
  * many times over at 100 TB.
  *
  * Determinism: positions come from `xxhash64(key, seed)` — fixed-seed,
  * engine-stable — and the bitmap is a pure set union (bit_or), so the
  * filter is identical across partitionings, retries, and cluster sizes.
  *
  * Scale contract: the bitmap is `mBits/64` longs (16 KiB at 2^17 bits),
  * collected once (a bounded, O(m) driver transfer — the same shape as
  * Spark's own runtime-filter exchange) and shipped to executors as a
  * plan literal. Size `mBits` ≈ 10–15 bits per expected build-side key
  * for a sub-percent false-positive rate.
  */
object BloomJoin {

  /** Default hash seeds (k = 3 probes per key). */
  val Seeds: Seq[Long] = Seq(0x9e3779b9L, 0x85ebca6bL, 0xc2b2ae35L)

  private def positions(key: Column, mBits: Int, seeds: Seq[Long]): Seq[Column] =
    seeds.map(s => pmod(xxhash64(key, lit(s)), lit(mBits.toLong)))

  /** Aggregate the build side's key positions into an `mBits`-bit bitmap
    * (as `mBits/64` words). One narrow shuffle of (word, bits) pairs;
    * the collect is bounded at m/64 rows regardless of input size.
    */
  def buildBitmap(build: DataFrame, keyCol: String, mBits: Int,
                  seeds: Seq[Long] = Seeds): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    val words = build
      .select(explode(array(positions(col(keyCol), mBits, seeds): _*)).as("pos"))
      .select(expr("pos div 64").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % lit(64L)).cast("int"))
          .as("bit"))
      .groupBy("word").agg(bit_or(col("bit")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test against a driver-built bitmap: a codegen'd
    * conjunction of k word probes over one array literal. The variable
    * shift amount goes through `call_function("shiftleft", …)` — the SQL
    * builtin accepts a column amount even though the Scala helper is
    * pinned to Int.
    */
  def mightContain(bitmap: Array[Long], key: Column,
                   seeds: Seq[Long] = Seeds): Column = {
    val mBits = bitmap.length * 64
    val bm = lit(bitmap)
    positions(key, mBits, seeds).map { p =>
      val wordIdx = (p / lit(64L)).cast("int") + lit(1) // element_at is 1-based
      val mask = call_function("shiftleft", lit(1L), (p % lit(64L)).cast("int"))
      element_at(bm, wordIdx).bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Semi-join of `big` on `bigKey` against `build`'s `buildKey` set with
    * the bloom pre-filter pushed ahead of the exact semi-join.
    */
  def reducedSemiJoin(big: DataFrame, bigKey: String,
                      build: DataFrame, buildKey: String,
                      mBits: Int, seeds: Seq[Long] = Seeds): DataFrame = {
    val bitmap = buildBitmap(build, buildKey, mBits, seeds)
    val keys = build.select(col(buildKey)).distinct()
    big.filter(mightContain(bitmap, col(bigKey), seeds))
      .join(keys, big(bigKey) === keys(buildKey), "leftsemi")
  }
}
