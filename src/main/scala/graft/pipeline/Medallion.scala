package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality, Scd}

/** Config-driven medallion pipeline: the reference's orchestration as a
  * library facility.
  *
  * Reference analogs, end to end:
  * - the ForEach-over-table-configs driver (reference: pipeline/
  *   incremental_ingestion.json + data_scripts/loop_input.json) →
  *   `TableSpec` list;
  * - watermark lookup/update around each copy (`last_cdc` Lookup /
  *   `update_last_cdc` Script) → `WatermarkStore` (a tiny parquet state
  *   table);
  * - bronze→silver cleaning (dedup by business key + expectations) →
  *   `Dedup.latestByKey` + `Quality.enforce`;
  * - gold CDC flows (`create_auto_cdc_flow`, scd_type 1/2) →
  *   `Scd.scd1Merge` / `Scd.scd2Merge`.
  *
  * Scale: each run reads only the (low, high] slice of each source (the
  * window predicate reaches the scan), merges into gold with cost
  * proportional to the slice (SCD2 rebuilds touched keys only), and
  * persists the new watermark. State besides gold tables is one row per
  * table.
  */
object Medallion {

  /** One table's pipeline config. `scdType` ∈ {1, 2}. */
  final case class TableSpec(
      name: String,
      keys: Seq[String],
      seqCol: String,
      tieCols: Seq[String] = Seq.empty,
      rules: Seq[Quality.Rule] = Seq.empty,
      scdType: Int = 1)

  /** Outcome of one table's run. */
  final case class RunResult(table: String, extracted: Long, cleaned: Long,
                             goldRows: Long, watermark: java.sql.Timestamp)

  /** Per-table high-watermark state in a single parquet table. */
  final class WatermarkStore(spark: SparkSession, path: String) {
    private def exists: Boolean = {
      val p = new Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    def get(table: String): Option[java.sql.Timestamp] =
      if (!exists) None
      else spark.read.parquet(path)
        .filter(col("table_name") === table)
        .orderBy(col("watermark").desc)
        .head(1).headOption.map(_.getTimestamp(1))

    def update(table: String, wm: java.sql.Timestamp): Unit = {
      import spark.implicits._
      Seq((table, wm)).toDF("table_name", "watermark")
        .write.mode("append").parquet(path)
    }
  }

  /** Run one incremental pass for every table spec:
    * extract (wm, high] → clean → merge into gold. Returns per-table
    * stats. `source(name)` provides the changelog frame (any reader).
    */
  def run(spark: SparkSession, specs: Seq[TableSpec],
          source: String => DataFrame, stateDir: String,
          highWatermark: java.sql.Timestamp): Seq[RunResult] = {
    val store = new WatermarkStore(spark, s"$stateDir/_watermarks")
    specs.map { spec =>
      val src = source(spec.name)
      val low = store.get(spec.name)
      // bronze: the (low, high] slice only
      val slice = low.fold(src.filter(col(spec.seqCol) <= lit(highWatermark)))(wm =>
        src.filter(col(spec.seqCol) > lit(wm) && col(spec.seqCol) <= lit(highWatermark)))
      // silver: expectations + key dedup (latest within the slice)
      val cleaned = Dedup.latestByKey(
        Quality.enforce(slice, spec.rules),
        spec.keys, (spec.seqCol +: spec.tieCols))
      val extracted = slice.count()
      val goldPath = s"$stateDir/gold/${spec.name}"
      val goldExists = {
        val p = new Path(goldPath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      }
      // gold: SCD merge of the cleaned slice
      val merged =
        if (!goldExists) {
          if (spec.scdType == 2)
            Scd.scd2FromChangelog(Quality.enforce(slice, spec.rules),
              spec.keys, spec.seqCol, spec.tieCols)
          else cleaned
        } else {
          val gold = spark.read.parquet(goldPath)
          if (spec.scdType == 2)
            Scd.scd2Merge(gold, Quality.enforce(slice, spec.rules),
              spec.keys, spec.seqCol, spec.tieCols)
          else Scd.scd1Merge(gold, cleaned, spec.keys, spec.seqCol +: spec.tieCols)
        }
      swapWrite(merged, goldPath)
      store.update(spec.name, highWatermark)
      RunResult(spec.name, extracted, cleaned.count(),
        spark.read.parquet(goldPath).count(), highWatermark)
    }
  }

  private def swapWrite(df: DataFrame, target: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val targetPath = new Path(target)
    val staging = new Path(target + "__staging")
    val fs = targetPath.getFileSystem(conf)
    df.write.mode("overwrite").parquet(staging.toString)
    fs.delete(targetPath, true)
    fs.rename(staging, targetPath)
  }
}
