package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Quality, Scd}
import graft.sources.Snapshots

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

  /** Outcome of one table's run. `extracted` = rows in the (low, high]
    * slice; `cleaned` = slice rows passing the DQ expectations (what
    * proceeds to the gold merge); `goldRows` = rows in the committed gold
    * snapshot. All three come from `Observation` metrics collected DURING
    * the gold write — a run triggers no counting actions of its own, so
    * stats stay free at any data size.
    */
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
      val obsSlice = Observation()
      val obsClean = Observation()
      val obsGold  = Observation()
      // bronze: the (low, high] slice only. The observe nodes piggyback
      // row counts on the gold write — no separate count() scans.
      val slice = low.fold(src.filter(col(spec.seqCol) <= lit(highWatermark)))(wm =>
          src.filter(col(spec.seqCol) > lit(wm) && col(spec.seqCol) <= lit(highWatermark)))
        .observe(obsSlice, count(lit(1)).as("n"))
      // silver: expectations, then key dedup (latest within the slice)
      // where SCD1 consumes a snapshot. SCD2 keeps every change row.
      val enforced = Quality.enforce(slice, spec.rules)
        .observe(obsClean, count(lit(1)).as("n"))
      val goldPath = s"$stateDir/gold/${spec.name}"
      // gold: SCD merge of the cleaned slice
      val merged =
        if (!Snapshots.exists(spark, goldPath)) {
          if (spec.scdType == 2)
            Scd.scd2FromChangelog(enforced, spec.keys, spec.seqCol, spec.tieCols)
          else Dedup.latestByKey(enforced, spec.keys, spec.seqCol +: spec.tieCols)
        } else {
          val gold = Snapshots.read(spark, goldPath)
          if (spec.scdType == 2)
            Scd.scd2Merge(gold, enforced, spec.keys, spec.seqCol, spec.tieCols)
          else Scd.scd1Merge(gold,
            Dedup.latestByKey(enforced, spec.keys, spec.seqCol +: spec.tieCols),
            spec.keys, spec.seqCol +: spec.tieCols)
        }
      Snapshots.commit(merged.observe(obsGold, count(lit(1)).as("n")), goldPath)
      store.update(spec.name, highWatermark)
      // An observe node inside a provably-empty subtree is pruned by AQE
      // and never fires; its count is then 0 by construction.
      def n(o: Observation): Long =
        o.get.getOrElse("n", 0L).asInstanceOf[Long]
      RunResult(spec.name, n(obsSlice), n(obsClean), n(obsGold), highWatermark)
    }
  }
}
