package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Multimodal (image/audio/video) column handling: opaque binary payloads
  * with typed metadata, and the batched-decode plumbing a real pipeline
  * hangs codecs on.
  *
  * Design for 100 TB: media bytes travel as a parquet `binary` column next
  * to their metadata; everything metadata-level (routing, filtering,
  * dedup-by-checksum, size stats) is pure columnar expression work that
  * never materializes the payload on the driver. Actual decoding
  * (image resize, audio resample, frame sampling) runs inside
  * `mapPartitions` so each task amortizes codec setup over its partition —
  * the Spark-native equivalent of a batched Pandas UDF.
  *
  * The codec itself is STUBBED here (no media libraries in this
  * environment): `decodeStub` derives deterministic fake dimensions from
  * the payload bytes. The partitioning, schema, and batch shape around it
  * are real — swapping `decodeStub` for a JNI/javacv codec changes no
  * plan shape.
  */
object Multimodal {

  /** Typed result of a (stubbed) decode. */
  final case class MediaMeta(doc_id: Long, media_type: String, width: Int,
                             height: Int, n_bytes: Long)

  /** The documents table recast as a media-payload table: the text bytes
    * stand in for opaque media bytes; a deterministic media_type routes
    * rows to per-modality decode paths.
    */
  def payloadTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      // checksum over the SOURCE text: for an ASCII corpus ascii(char) ==
      // byte value, so this equals a byte-level rolling checksum of the
      // payload — and stays oracle-expressible.
      TextAnalysis.rollingFingerprint(col("text")).as("checksum"))

  /** Pure-column metadata extraction over the payload — byte length, a
    * magic-prefix fingerprint (first 8 bytes as hex), and the stub
    * "decode" as closed-form arithmetic. All codegen'd; no payload bytes
    * leave the scan.
    */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      octet_length(col("payload")).as("byte_len"),
      substring(hex(col("payload")), 1, 16).as("head_hex"),
      col("checksum"),
      (lit(64) + octet_length(col("payload")) % 193).as("width"),
      (lit(64) + (octet_length(col("payload")) * 31) % 193).as("height"))

  /** Frame-sampling plan for video payloads: `n` byte offsets spaced
    * uniformly through the payload (the seek table a real demuxer would
    * refine). Pure array arithmetic — the sampling SCHEDULE is computed
    * at scan speed for the whole corpus; only the sampled offsets ever
    * reach the (expensive, per-partition) decode stage.
    */
  def frameSampleOffsets(byteLen: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => floor((byteLen.cast("long") * i) / lit(n.toDouble)).cast("long"))

  /** Deterministic fake codec — REPLACE with a real decoder (e.g. javacv /
    * ImageIO behind a thread-local) in production. Mirrors the arithmetic
    * in `extractMeta` so the two paths are cross-checkable in tests.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) =
    (64 + bytes.length % 193, 64 + (bytes.length * 31) % 193)

  /** Batched decode over partitions: the real-codec plug point. Each task
    * walks its partition once, applying `codec` per payload — codec
    * initialization (the expensive part for real media libraries) happens
    * once per partition, not per row.
    */
  def decodeBatched(media: DataFrame)(codec: Array[Byte] => (Int, Int)): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mt, bytes) =>
          val (w, h) = codec(bytes)
          MediaMeta(id, mt, w, h, bytes.length.toLong)
        }
      }
  }
}
