package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway round-13 session-config-independence probe (the round-11
  * discipline): run the round's new queries under a hostile session
  * (America/New_York timezone, tr_TR default locale, 7 shuffle
  * partitions) and print row counts + value hashes in the INSTANT
  * domain for cross-session comparison. Deleted after the round record
  * is written.
  */
object ProbeR13 {
  private val newQueries = Seq(
    "q214_sql_kernels", "q215_pmi_collocations", "q216_pagerank_directed",
    "q217_bitemporal", "q218_stream_cusum", "q219_stream_topk",
    "q220_theilsen_trend", "q221_hilbert_manifest", "q222_recommendations",
    "q223_pq_codes", "q224_kn_counts", "q225_bpe_merges")

  def main(args: Array[String]): Unit = {
    val tz = args.headOption.getOrElse("UTC")
    val parts = if (args.length > 1) args(1) else "4"
    if (tz != "UTC") java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", tz)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    newQueries.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      // hash timestamps in the instant domain (unix_micros) — the
      // parquet-value domain the driver gate compares
      val cols = df.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.TimestampType)
          unix_micros(col(f.name))
        else col(f.name)
      }.toIndexedSeq
      val h = df.select(xxhash64(cols: _*).as("h"))
        .agg(bit_xor(col("h"))).head().getLong(0)
      println(s"PROBE $name rows=${df.count()} hash=$h")
    }
    spark.stop()
  }
}
