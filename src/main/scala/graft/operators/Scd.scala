package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension builds over a changelog.
  *
  * Reference analog: the gold layer applies CDC flows with
  * `stored_as_scd_type=2` for dimensions (reference: local_spotify_dab/src/
  * gold/spotify_etl/transformations/DimArtist.py:99-109, DimUser.py,
  * DimTrack.py, DimDate.py) and `stored_as_scd_type=1` for the fact table
  * (reference: .../FactStream.py:96-105), keyed by a business key and
  * ordered by a sequence column.
  */
object Scd {

  /** SCD Type 1: latest-wins snapshot per key (FactStream.py semantics). */
  def scd1Latest(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame =
    Dedup.latestByKey(df, keys, orderCols)

  /** SCD Type 1 incremental merge: apply an update batch onto a base
    * snapshot, latest wins per key. Union + argmax keeps it a single
    * shuffle (no join), which is the scalable upsert shape when the sink
    * has no native MERGE.
    */
  def scd1Merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
                orderCols: Seq[String]): DataFrame =
    Dedup.latestByKey(base.unionByName(updates), keys, orderCols)

  /** SCD Type 2: changelog → validity intervals. Each change row becomes a
    * version effective from its sequence value until the next change for
    * the same key (`effective_to` null = current). One shuffle on the key;
    * the per-key sort is what SCD2 fundamentally requires.
    */
  def scd2FromChangelog(df: DataFrame, keys: Seq[String], seqCol: String,
                        tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((seqCol +: tieCols).map(col): _*)
    df.withColumn("effective_from", col(seqCol))
      .withColumn("effective_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** SCD2 incremental merge: fold a batch of new change rows into an
    * existing history. Only keys present in the batch are rebuilt — their
    * history rows (which still carry the original sequence column) are
    * re-derived together with the new changes — while untouched keys pass
    * through without recomputation. Exactly-once under redelivery: change
    * rows are deduplicated on (keys, seq, ties) before rebuilding.
    *
    * Scale: two semi/anti joins on the key (batch side is small) plus one
    * keyed shuffle over only the AFFECTED keys' rows — cost tracks batch
    * size, not history size.
    */
  def scd2Merge(history: DataFrame, updates: DataFrame, keys: Seq[String],
                seqCol: String, tieCols: Seq[String]): DataFrame = {
    val metaCols = Seq("effective_from", "effective_to", "is_current")
    val batchKeys = updates.select(keys.map(col): _*).distinct()
    val touched = history.join(batchKeys, keys, "left_semi")
    val untouched = history.join(batchKeys, keys, "left_anti")
    val changelog = touched.drop(metaCols: _*)
      .unionByName(updates)
      .dropDuplicates(keys ++ (seqCol +: tieCols))
    scd2FromChangelog(changelog, keys, seqCol, tieCols).unionByName(untouched)
  }

  /** Point-in-time (as-of) snapshot of an SCD2 table: the version valid at
    * `at`. Pure filter — pushed into the scan, no shuffle.
    */
  def asOfSnapshot(scd2: DataFrame, at: Column): DataFrame =
    scd2.filter(col("effective_from") <= at &&
      (col("effective_to").isNull || col("effective_to") > at))
}
