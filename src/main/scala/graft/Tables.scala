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
    * (legacy nanosAsLong) and truncate to micros with integer division —
    * exactly the truncation DuckDB applies when it reads the same file into
    * its microsecond TIMESTAMP, so both engines see identical instants.
    * (Plain `/ 1000` would round-trip through double and lose precision:
    * epoch-nanos ≈ 1.7e18 > 2^53.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    eventsRawNanos(spark, dir)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** `events` with `ts` still raw epoch-nanos (LongType). Time-window
    * operators filter THIS form so the range predicate reaches the parquet
    * scan as a plain long comparison — `timestamp_micros(ts div 1000) > X`
    * is opaque to the reader and would scan the full table at 100 TB.
    *
    * The `nanosAsLong` conf set here is deliberate, not an oversight:
    * `SparkEntry.queries`/`entry` are invoked by arbitrary driver sessions
    * that have not pre-configured it, and the flag is write-once-true
    * (never toggled back), so repeated sets are idempotent and safe under
    * concurrent readers.
    */
  def eventsRawNanos(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
  }

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
