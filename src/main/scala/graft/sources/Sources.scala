package graft.sources

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
}
