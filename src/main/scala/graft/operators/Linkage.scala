package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage / entity-resolution matching: find near-identical name
  * strings (typos, variant spellings, duplicate listings) via blocking +
  * edit-distance verification.
  *
  * Reference analog: the silver-layer cleaning stage — the reference
  * validates/cleans identity columns (utilities/utils.py `is_valid_email`,
  * Silver_Dimensions.py dropDuplicates by business key); fuzzy linkage is
  * the same dedup problem when keys DON'T match exactly.
  *
  * Design is dictionary-first: entity tables repeat the same strings
  * massively, so the name DICTIONARY (distinct strings + entity counts) is
  * orders of magnitude smaller than the entity table — one hash-agg
  * builds it, the quadratic-ish candidate join runs on the dictionary
  * inside blocks, and results map back to entities by count, never by a
  * per-entity cross product. With B blocks of ~d names each, candidate
  * pairs are O(B·d²) on the TINY dictionary — the entity table is
  * touched exactly once.
  *
  * Verification is `levenshtein` (codegen'd in Spark, identical classic
  * edit-distance semantics in DuckDB), applied ONLY to in-block
  * candidates. The block key must be match-preserving for the intended
  * edit class (here: edits confined to one token, so blocking on another
  * token keeps recall 1.0 for that class — the standard blocking
  * trade-off, stated rather than hidden).
  */
object Linkage {

  /** Distinct values of `nameCol` with entity counts — the dictionary. */
  def nameDictionary(df: DataFrame, nameCol: String): DataFrame =
    df.groupBy(col(nameCol).as("name")).agg(count(lit(1)).as("n_rows"))

  /** In-block fuzzy pairs over a dictionary: `blockOf(name)` buckets the
    * candidates, `name_a < name_b` orients each unordered pair once, and
    * pairs survive iff edit distance ≤ `maxDist`. Dictionary sides are
    * broadcast when small (the planner sees the tiny hash-agg output).
    */
  def fuzzyPairs(dict: DataFrame, blockOf: Column => Column,
                 maxDist: Int): DataFrame = {
    val a = dict.select(col("name").as("name_a"), col("n_rows").as("n_rows_a"),
      blockOf(col("name")).as("__blk"))
    val b = dict.select(col("name").as("name_b"), col("n_rows").as("n_rows_b"),
      blockOf(col("name")).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      // exactness-preserving pre-filter: levenshtein ≥ |len_a − len_b|,
      // so pairs differing by more than maxDist in length can never
      // survive — drop them before the DP runs at all
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // threshold form (SPARK-44510): the DP band-limits at maxDist+1
      // and bails early — O(maxDist·n) per pair instead of O(n²) — and
      // returns −1 past the threshold, so the ≥ 0 guard reproduces the
      // original ≤ maxDist filter with identical surviving distances
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .drop("__blk")
  }
}
