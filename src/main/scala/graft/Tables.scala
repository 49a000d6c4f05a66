package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-on-read accessors for the star-schema testdata.
  *
  * Plays the role of the reference's bronze layer source surface
  * (reference: data_scripts/spotify_initial_load.sql:7-52 -- star schema of
  * Dim/Fact tables; reference: local_spotify_dab/src/silver/
  * Silver_Dimensions.py -- per-table parquet reads). Readers are plain
  * parquet scans so Catalyst pushes filters and prunes columns straight
  * into the scan.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is a parquet TIMESTAMP(NANOS) column, which Spark cannot
    * map to its microsecond TimestampType directly. Read it as raw nanos
    * and truncate to micros with integer division — exactly the truncation
    * DuckDB applies when it reads the same file into its microsecond
    * TIMESTAMP, so both engines see identical instants. (Plain `/ 1000`
    * would round-trip through double and lose precision: epoch-nanos
    * ≈ 1.7e18 > 2^53.)
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRawNanos(spark, dir)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

  /** Explicit read schema for events: declaring `ts` as LongType lets the
    * parquet reader hand back the raw nanos WITHOUT the global
    * `spark.sql.legacy.parquet.nanosAsLong` flag — no session conf is
    * mutated, so the accessor is safe under any caller session and
    * concurrent readers.
    */
  private val EventsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props",
      org.apache.spark.sql.types.StringType)))

  /** `events` with `ts` still raw epoch-nanos (LongType). Time-window
    * operators filter THIS form so the range predicate reaches the parquet
    * scan as a plain long comparison — `timestamp_micros(ts div 1000) > X`
    * is opaque to the reader and would scan the full table at 100 TB.
    */
  def eventsRawNanos(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(EventsSchema).parquet(s"$dir/events.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
