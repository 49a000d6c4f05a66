package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based deduplication.
  *
  * Reference analog: the silver layer deduplicates each dimension by its
  * business key (reference: local_spotify_dab/src/silver/
  * Silver_Dimensions.py:447 `dropDuplicates(["user_id"])`, :684
  * `dropDuplicates(["artist_id"])`). The reference relies on arrival order;
  * here the kept row is defined deterministically by an ordering column
  * list (latest wins), which is also what the gold DLT CDC flows do with
  * `sequence_by` (reference: local_spotify_dab/src/gold/spotify_etl/
  * transformations/FactStream.py:96-105).
  *
  * Scale design: implemented as a hash aggregation with `max_by` over a
  * struct ordering key — ONE shuffle on the business key with map-side
  * partial aggregation (each task keeps one row per key before the
  * exchange), instead of a window `row_number` which would shuffle every
  * row and sort whole partitions. At 100 TB the partial agg collapses the
  * shuffle to ~|distinct keys| rows.
  */
object Dedup {

  /** Keep the winning row per key, where "winning" = max of `orderCols`
    * compared lexicographically (put a unique id last for determinism).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payloadCols = df.columns.filterNot(keys.contains).toIndexedSeq
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payloadCols.map(col): _*), ord).as("__winner"))
      .select(keys.map(col) ++ payloadCols.map(c => col(s"__winner.$c").as(c)): _*)
  }

  /** Exact content dedup: canonical row per distinct `contentCol` value is
    * the one with the smallest `idCol`. Returns (id, dup_count) per kept
    * row. Single hash-agg shuffle on the content column; at scale the
    * content column can be pre-hashed (xxhash64) to shrink shuffle width.
    */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("dup_count"))
}
