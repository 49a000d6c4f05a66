package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Bounded file-stream ingestion: the Spark-native form of the reference's
  * Autoloader bronze→silver hop (reference: local_spotify_dab/src/silver/
  * Silver_Dimensions.py — `cloudFiles` parquet stream with
  * `trigger(availableNow=True)` writing an append sink).
  *
  * `availableNow` turns the stream into an incremental batch: each run
  * processes exactly the files that arrived since the last checkpoint and
  * stops — the same watermark-free CDC contract the reference gets from
  * Autoloader file tracking. At 100 TB this is the right ingestion shape:
  * file-listing state lives in the checkpoint (RocksDB at scale), the
  * clean/transform stage is ordinary codegen'd columnar work, and the sink
  * append is partitioned parquet.
  */
object IngestPipeline {

  /** Schema-enforced parquet file stream over a landing directory. */
  def boundedFileStream(spark: SparkSession, srcDir: String,
                        schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)

  /** Run one incremental pass: read new files, apply `clean`, append to a
    * parquet sink. Returns the started query; callers await termination.
    */
  def runOnce(src: DataFrame, clean: DataFrame => DataFrame,
              sinkDir: String, checkpointDir: String): StreamingQuery =
    clean(src).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
