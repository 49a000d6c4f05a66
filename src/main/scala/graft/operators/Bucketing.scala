package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins: pre-shuffle once at write time, join
  * shuffle-free forever after.
  *
  * At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
  * stream ⋈ stream in the reference's domain) is the exchange of both
  * sides. Writing both tables bucketed (and sorted) by the join key with
  * the same bucket count moves that shuffle to write time — every
  * subsequent join, aggregation, or MERGE keyed on the bucket column
  * plans without an Exchange on either side. This is the batch analog of
  * the co-partitioning the streaming sinks get from their checkpointed
  * state stores.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table (external, at `path`).
    * `buckets` must match on every table meant to co-join.
    */
  def saveBucketed(df: DataFrame, table: String, path: String, key: String,
                   buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — plans without a
    * shuffle on either side (verify with `.explain`: no Exchange below
    * the join).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
