package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, Scd}
import graft.sources.Snapshots

/** `foreachBatch` SCD sinks — the Spark-native analog of the reference's
  * DLT auto-CDC flows (reference: local_spotify_dab/src/gold/spotify_etl/
  * transformations/FactStream.py:96-105 `create_auto_cdc_flow` scd_type=1;
  * DimArtist.py:99-109 scd_type=2).
  *
  * The target is a parquet snapshot maintained through
  * [[graft.sources.Snapshots]]: each micro-batch derives the full merged
  * snapshot and commits it via the manifest-pointer protocol, so a crash
  * at ANY point leaves a complete, readable snapshot (the Delta-
  * transactionality analog without a table format). Every batch is
  * idempotent — re-delivery re-derives and re-commits the same state.
  * On a real deployment with Delta/Iceberg the commit becomes a MERGE and
  * the merge logic below becomes the MERGE condition; the dataflow shape
  * (union + one keyed shuffle, no read-modify-write loops) is unchanged.
  */
object ScdSinks {

  /** SCD1 (latest-wins) upsert sink: merge each micro-batch into the
    * snapshot at `path`, keeping the winning row per key.
    */
  def scd1(path: String, keys: Seq[String], orderCols: Seq[String])
          (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val merged =
      if (Snapshots.exists(spark, path))
        Scd.scd1Merge(Snapshots.read(spark, path), batch, keys, orderCols)
      else Dedup.latestByKey(batch, keys, orderCols)
    Snapshots.commit(merged, path)
  }

  /** SCD2 history sink: merge each micro-batch of change rows into the
    * validity-interval history at `path`.
    */
  def scd2(path: String, keys: Seq[String], seqCol: String, tieCols: Seq[String])
          (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val merged =
      if (Snapshots.exists(spark, path))
        Scd.scd2Merge(Snapshots.read(spark, path), batch, keys, seqCol, tieCols)
      else Scd.scd2FromChangelog(batch, keys, seqCol, tieCols)
    Snapshots.commit(merged, path)
  }
}
