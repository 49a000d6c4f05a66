package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, Scd}

/** `foreachBatch` SCD sinks — the Spark-native analog of the reference's
  * DLT auto-CDC flows (reference: local_spotify_dab/src/gold/spotify_etl/
  * transformations/FactStream.py:96-105 `create_auto_cdc_flow` scd_type=1;
  * DimArtist.py:99-109 scd_type=2).
  *
  * The target here is a plain parquet snapshot maintained by
  * stage-and-swap: each micro-batch writes the merged result to a staging
  * directory, then atomically renames it over the target. That makes every
  * batch idempotent (re-delivery re-derives the same snapshot) without a
  * transactional table format; on a real deployment the swap is replaced
  * by a Delta/Iceberg MERGE and the merge logic below becomes the MERGE
  * condition — the dataflow shape (union + one keyed shuffle, no
  * read-modify-write loops) is unchanged.
  */
object ScdSinks {

  private def exists(df: DataFrame, path: String): Boolean = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Write `df` to `target` via staging + atomic rename (safe to read the
    * old snapshot while computing `df`).
    */
  private def swapWrite(df: DataFrame, target: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val targetPath = new Path(target)
    val staging = new Path(target + "__staging")
    val fs = targetPath.getFileSystem(conf)
    df.write.mode("overwrite").parquet(staging.toString)
    fs.delete(targetPath, true)
    fs.rename(staging, targetPath)
  }

  /** SCD1 (latest-wins) upsert sink: merge each micro-batch into the
    * snapshot at `path`, keeping the winning row per key.
    */
  def scd1(path: String, keys: Seq[String], orderCols: Seq[String])
          (batch: DataFrame, batchId: Long): Unit = {
    val merged =
      if (exists(batch, path))
        Scd.scd1Merge(batch.sparkSession.read.parquet(path), batch, keys, orderCols)
      else Dedup.latestByKey(batch, keys, orderCols)
    swapWrite(merged, path)
  }

  /** SCD2 history sink: merge each micro-batch of change rows into the
    * validity-interval history at `path`.
    */
  def scd2(path: String, keys: Seq[String], seqCol: String, tieCols: Seq[String])
          (batch: DataFrame, batchId: Long): Unit = {
    val merged =
      if (exists(batch, path))
        Scd.scd2Merge(batch.sparkSession.read.parquet(path), batch, keys, seqCol, tieCols)
      else Scd.scd2FromChangelog(batch, keys, seqCol, tieCols)
    swapWrite(merged, path)
  }
}
