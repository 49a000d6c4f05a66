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

  /** Portable uniform-ish hash of a long key into [0, P). */
  def keyHash(key: Column): Column = (lit(HA) * key + lit(HB)) % lit(P)

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
}
