package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced readers with rescue-column capture.
  *
  * Reference analog: the silver layer ingests with Databricks Autoloader in
  * schema-evolution "rescue" mode and then drops the rescue column after
  * validation (reference: local_spotify_dab/src/silver/
  * Silver_Dimensions.py — `cloudFiles.schemaEvolutionMode=rescue`, then
  * `.drop("_rescued_data")`).
  *
  * The Spark-native equivalent: read semi-structured sources PERMISSIVE
  * against an explicit schema, routing anything that does not fit —
  * malformed lines, type mismatches — into a `_rescued_data` string column
  * instead of silently nulling or failing the job. Callers then split the
  * stream into clean rows and a quarantine (`splitRescued`), which is the
  * shape a 100 TB ingestion needs: bad records are data, not exceptions.
  *
  * Schema-on-read with explicit schemas also means no inference pass —
  * at scale, inference is a full extra read of the source.
  */
object Sources {

  val RescueCol = "_rescued_data"

  private def withRescueField(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(RescueCol, StringType, nullable = true))

  /** JSON-lines read: rows that fail the schema land in `_rescued_data`
    * with the raw record text preserved.
    */
  def jsonWithRescue(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withRescueField(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescueCol)
      .json(path)

  /** CSV read with the same rescue contract. */
  def csvWithRescue(spark: SparkSession, path: String, schema: StructType,
                    header: Boolean = true): DataFrame =
    spark.read
      .schema(withRescueField(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", RescueCol)
      .option("header", header.toString)
      .csv(path)

  /** Parquet is self-describing; enforcing the schema prunes to exactly
    * the requested columns at the scan.
    */
  def parquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** ORC read with an enforced schema — the second columnar lake format
    * (ORC ships in Spark's core distribution alongside parquet). Like
    * the parquet reader, enforcing the schema prunes the scan to exactly
    * the requested columns, and comparison/range predicates reach the
    * ORC reader as pushed filters backed by ORC's file/stripe/row-group
    * statistics indexes (PlanSpec pins `PushedFilters` on this scan) —
    * at 100 TB a selective date filter skips whole stripes without
    * decoding them.
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC write. Same retry posture as [[writePartitioned]]: default
    * `errorifexists`, appends are an explicit caller decision.
    */
  def writeOrc(df: DataFrame, path: String,
               saveMode: String = "errorifexists"): Unit =
    df.write.mode(saveMode).orc(path)

  /** Hive-layout partitioned parquet write: one directory per value of
    * `partitionCols` (low-cardinality columns — a time grain, a source, a
    * language). The payoff is at READ time: an equality/IN filter on a
    * partition column prunes whole directories before any file is opened
    * (`PartitionFilters` in the scan, asserted by PipelineSpec), which at
    * 100 TB is the difference between scanning a day and scanning a year.
    * `maxRecordsPerFile` bounds file sizes without an extra repartition.
    * `saveMode` defaults to `errorifexists`: a retried pipeline step must
    * not silently double every row in the target, so appending is an
    * explicit caller decision (`append` for true incremental landings,
    * `overwrite` for idempotent rebuilds).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L,
                       saveMode: String = "errorifexists"): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(saveMode)
      .parquet(path)

  /** Split a rescued read into (clean, quarantine): clean rows with the
    * rescue column dropped (the reference's silver `.drop("_rescued_data")`
    * step); quarantine keeps the full row — partially-parsed fields plus
    * the raw record — for replay/inspection. (Keeping the parsed fields
    * also sidesteps Spark's corrupt-column-only query restriction
    * [UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN].)
    */
  def splitRescued(df: DataFrame): (DataFrame, DataFrame) = {
    // Spark refuses rescue-column predicates directly over raw file scans
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN): the parse
    // must be materialized before the split. Cache serves locally; a
    // 100 TB ingestion lands the parsed batch in a table (or splits
    // per-micro-batch inside foreachBatch) instead.
    val parsed = df.cache()
    val clean = parsed.filter(col(RescueCol).isNull).drop(RescueCol)
    val quarantine = parsed.filter(col(RescueCol).isNotNull)
    (clean, quarantine)
  }

  // ---- Schema evolution (Autoloader `addNewColumns` analog) -----------------
  // Reference: Silver_Dimensions.py:316 — `cloudFiles.schemaLocation` tracks
  // the evolving schema across runs and new columns are admitted into it.
  // Here the tracked schema lives in a tiny JSON file; each batch's observed
  // columns are merged in (new top-level fields appended nullable, existing
  // fields keep their established type — a type CHANGE is not evolution and
  // still lands in `_rescued_data`).

  /** Persistent evolving-schema state (`schemaLocation` analog). */
  final class SchemaStore(spark: SparkSession, path: String) {
    private def fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def load(): Option[StructType] = {
      val p = new Path(path)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        Some(org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType])
      }
    }

    def save(schema: StructType): Unit = {
      val p = new Path(path)
      val tmp = new Path(p.getParent, "." + p.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(schema.json.getBytes("UTF-8")) finally out.close()
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"could not persist schema at $path")
    }
  }

  /** Merge an observed batch schema into the established one: established
    * fields keep their position and type; unseen top-level fields are
    * appended (nullable — earlier data simply lacks them).
    */
  def evolveSchema(base: StructType, incoming: StructType): StructType = {
    val known = base.fieldNames.toSet
    StructType(base.fields ++
      incoming.fields.filterNot(f => known(f.name) || f.name == RescueCol)
        .map(_.copy(nullable = true)))
  }

  /** Project `df` onto `target`: present columns pass through, columns the
    * batch predates become typed nulls — how historical rows are
    * null-padded when read alongside evolved data.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.map { f =>
      if (present(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** JSON-lines read that EVOLVES the tracked schema: the batch's observed
    * columns (one schema-inference pass over the new files only — the same
    * cost Autoloader pays to detect new columns) are merged into the
    * store, then the batch is read against the widened schema with the
    * usual rescue contract. Returns rows in the evolved schema; batches
    * written before a column existed read back null-padded via `alignTo`.
    */
  def jsonEvolving(spark: SparkSession, path: String, store: SchemaStore): DataFrame = {
    val observed = spark.read.json(path).schema
    val evolved = store.load().fold(
      StructType(observed.fields.filterNot(_.name == RescueCol).map(_.copy(nullable = true))))(
      base => evolveSchema(base, observed))
    store.save(evolved)
    jsonWithRescue(spark, path, evolved)
  }
}
