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
  * Codecs — all three modalities run REAL pure-JDK decoders through the
  * plug-point: `decodeWav` (RIFF/WAVE chunk walk), `decodeImage`
  * (`javax.imageio`: PNG/BMP/GIF/JPEG as the JDK ships them), and
  * `decodeAvi` (RIFF/AVI demux — header parse, `movi` frame walk, sampled
  * MJPEG frames decoded via `javax.imageio`). Codecs the JDK lacks (H.264
  * etc.) would slot into the same `mapPartitions` shape via JNI/javacv —
  * swapping the decoder changes no plan shape.
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

  /** Decoded RIFF/WAVE header fields. `duration_us` is derived from the
    * data-chunk size and the declared byte rate.
    */
  final case class WavMeta(doc_id: Long, channels: Int, sample_rate: Int,
                           bits_per_sample: Int, data_bytes: Long,
                           duration_us: Long)

  /** A REAL decoder through the plug-point: minimal RIFF/WAVE container
    * parse (magic check, chunk walk with word alignment, `fmt ` and `data`
    * chunks) — pure JDK, so it actually runs in this environment, and it
    * exercises exactly the byte-level work a javacv/ImageIO codec would do
    * behind the same `mapPartitions` shape. Throws on a malformed payload
    * (a production pipeline routes those to a quarantine sink).
    */
  def decodeWav(docId: Long, bytes: Array[Byte]): WavMeta = {
    def ascii(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44 && ascii(0) == "RIFF" && ascii(8) == "WAVE",
      s"doc $docId: not a RIFF/WAVE payload")
    var pos = 12
    var channels, rate, byteRate, bits = -1
    var dataBytes = -1L
    while (pos + 8 <= bytes.length && (channels < 0 || dataBytes < 0)) {
      val id = ascii(pos)
      val size = bb.getInt(pos + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt ") {
        channels = bb.getShort(pos + 10) & 0xFFFF
        rate = bb.getInt(pos + 12)
        byteRate = bb.getInt(pos + 16)
        bits = bb.getShort(pos + 22) & 0xFFFF
      } else if (id == "data") dataBytes = size
      // chunks are 16-bit word aligned: odd sizes carry a pad byte
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    require(channels > 0 && byteRate > 0 && dataBytes >= 0,
      s"doc $docId: missing fmt/data chunk")
    WavMeta(docId, channels, rate, bits, dataBytes,
      dataBytes * 1000000L / byteRate)
  }

  /** Batched WAV decode: one chunk-walking parser pass per payload inside
    * `mapPartitions` — the audio instantiation of `decodeBatched`'s shape.
    */
  def decodeWavBatched(media: DataFrame): Dataset[WavMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeWav(id, bytes) })
  }

  /** Decoded image fields. `px_sum` is the sum of all R+G+B channel bytes —
    * a deterministic full-raster statistic proving the pixels (not just the
    * header) were decoded; real feature extraction (resize, embedding
    * preprocessing) slots in at the same point.
    */
  final case class ImageMeta(doc_id: Long, format: String, width: Int,
                             height: Int, px_sum: Long, n_bytes: Long)

  /** A REAL image decoder through the plug-point: pure-JDK `javax.imageio`
    * (PNG, BMP, GIF, JPEG — the readers the JDK ships), so it actually runs
    * in this environment. Dimensions come from the container header
    * (`reader.getWidth(0)` parses the header only — the cheap path a
    * metadata-only pipeline stops at) and the raster is then fully decoded
    * for the pixel statistic. Throws on an unrecognized container (a
    * production pipeline routes those to a quarantine sink, same contract
    * as `decodeWav`).
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): ImageMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"doc $docId: unrecognized image container")
      val r = readers.next()
      try {
        r.setInput(iis)
        val (w, h) = (r.getWidth(0), r.getHeight(0))
        val img = r.read(0)
        ImageMeta(docId, r.getFormatName.toLowerCase, w, h, rasterSum(img),
          bytes.length.toLong)
      } finally r.dispose()
    } finally iis.close()
  }

  /** Sum of all R+G+B channel bytes over a decoded raster. */
  private def rasterSum(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Batched image decode: one `javax.imageio` pass per payload inside
    * `mapPartitions` — the image instantiation of `decodeBatched`'s shape.
    * Reader lookup and disposal happen per payload (ImageIO readers are
    * not thread-safe to share); the registry scan they amortize is
    * class-level, so per-partition batching still pays off.
    */
  def decodeImageBatched(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeImage(id, bytes) })
  }

  /** Decoded video container fields. `n_frames` counts the video chunks
    * actually present in the `movi` list (the demuxed truth, not the
    * header's claim); `duration_us` derives from it and the header frame
    * interval. `px_sum` accumulates the full-raster statistic over the
    * SAMPLED frames only — proof the sampled frames' pixels were decoded.
    */
  final case class VideoMeta(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, duration_us: Long,
                             sampled_frames: Int, px_sum: Long, n_bytes: Long)

  /** A REAL video demuxer through the plug-point: minimal RIFF/AVI parse
    * (magic check, recursive LIST walk, `avih` main header, `movi` frame
    * chunks) with every `sampleEvery`-th frame decoded as MJPEG via
    * `javax.imageio` — pure JDK, so it actually runs in this environment.
    * Frame sampling happens at the CONTAINER level: skipped frames are
    * never decoded, only chunk-walked past, which is exactly how a
    * production frame-sampler avoids paying full decode cost for a 1%
    * sample (`frameSampleOffsets` computes such schedules corpus-wide).
    * Codecs the JDK cannot decode (H.264 etc.) fail loudly at the frame
    * decode — the quarantine-sink contract shared by all three codecs.
    */
  def decodeAvi(docId: Long, bytes: Array[Byte], sampleEvery: Int = 1): VideoMeta = {
    def ascii(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12 && ascii(0) == "RIFF" && ascii(8) == "AVI ",
      s"doc $docId: not a RIFF/AVI payload")
    var width, height = -1
    var usecPerFrame = -1L
    var frames, sampled = 0
    var pxSum = 0L
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = ascii(pos)
        val size = (bb.getInt(pos + 4).toLong & 0xFFFFFFFFL).toInt
        val body = pos + 8
        require(body + size <= bytes.length, s"doc $docId: truncated chunk $id")
        if (id == "LIST") walk(body + 4, body + size) // list type fourcc, then children
        else if (id == "avih") {
          usecPerFrame = bb.getInt(body).toLong & 0xFFFFFFFFL
          width = bb.getInt(body + 32)
          height = bb.getInt(body + 36)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          // a video frame chunk (##dc compressed / ##db uncompressed DIB)
          if (frames % sampleEvery == 0) {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(bytes, body, body + size)))
            require(img != null, s"doc $docId: undecodable frame $frames")
            pxSum += rasterSum(img)
            sampled += 1
          }
          frames += 1
        }
        // chunks are 16-bit word aligned: odd sizes carry a pad byte
        pos = body + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    require(width > 0 && usecPerFrame > 0, s"doc $docId: missing avih header")
    VideoMeta(docId, width, height, frames, usecPerFrame * frames,
      sampled, pxSum, bytes.length.toLong)
  }

  /** Batched video demux + sampled-frame decode: one container walk per
    * payload inside `mapPartitions` — the video instantiation of
    * `decodeBatched`'s shape.
    */
  def decodeAviBatched(media: DataFrame, sampleEvery: Int = 1): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAvi(id, bytes, sampleEvery) })
  }

  /** A resized image: source and target dims, the re-encoded payload, and
    * the output raster's R+G+B sum (the cheap integrity statistic the
    * specs verify against a reference resample).
    */
  final case class ResizedImage(doc_id: Long, width: Int, height: Int,
                                out_w: Int, out_h: Int,
                                out_bytes: Array[Byte], out_px_sum: Long)

  /** REAL image resize through the plug-point: decode (javax.imageio),
    * nearest-neighbor resample with the EXPLICIT floor mapping
    * `src(x·w/outW, y·h/outH)` — hand-rolled rather than Graphics2D so
    * the output raster is bit-identical on every JVM/platform (AWT
    * interpolation pipelines are not contractually deterministic) — and
    * re-encode as PNG. The thumbnail/preprocess step of an image-training
    * pipeline, minus the learned transforms.
    */
  def resizeImage(docId: Long, bytes: Array[Byte], outW: Int, outH: Int): ResizedImage = {
    require(outW > 0 && outH > 0, s"doc $docId: bad target $outW x $outH")
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(src != null, s"doc $docId: payload is not a decodable image")
    val (w, h) = (src.getWidth, src.getHeight)
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sum = 0L
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val rgb = src.getRGB((x.toLong * w / outW).toInt, sy)
        out.setRGB(x, y, rgb)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(out, "png", bos),
      s"doc $docId: no PNG writer available")
    ResizedImage(docId, w, h, outW, outH, bos.toByteArray, sum)
  }

  /** Batched resize: decode + resample + re-encode per payload inside
    * `mapPartitions` — one task never holds more than its partition's
    * rasters.
    */
  def resizeImageBatched(media: DataFrame, outW: Int, outH: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => resizeImage(id, bytes, outW, outH) })
  }

  /** Windowed audio features over one payload: per fixed-size sample
    * window, the RMS level, the absolute peak, and the zero-crossing
    * count — the cheap silence/clipping/voice-activity signals an audio
    * curation pipeline filters on.
    */
  final case class AudioWindow(doc_id: Long, window_idx: Int, n_samples: Int,
                               rms: Double, peak: Int, zero_crossings: Long)

  /** REAL audio feature extraction through the plug-point: RIFF/WAVE
    * container walk (same parser contract as `decodeWav`), then 16-bit
    * little-endian PCM samples folded SEQUENTIALLY per window — fixed
    * fold order, so rms doubles are bit-identical everywhere. Requires
    * bits_per_sample == 16 (the PCM depth the fixtures and real speech
    * corpora use); channels are treated as one interleaved stream, which
    * leaves window boundaries sample-aligned for any channel count.
    */
  def audioFeatures(docId: Long, bytes: Array[Byte],
                    windowSamples: Int): Seq[AudioWindow] = {
    require(windowSamples > 0, s"doc $docId: bad window $windowSamples")
    val wav = decodeWav(docId, bytes)
    require(wav.bits_per_sample == 16,
      s"doc $docId: audioFeatures needs 16-bit PCM, got ${wav.bits_per_sample}")
    // re-walk to the data chunk (decodeWav validated the container)
    def le32(off: Int) =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def ascii(off: Int) =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var off = 12
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length && dataOff < 0) {
      val (id, size) = (ascii(off), le32(off + 4))
      if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(dataOff >= 0, s"doc $docId: no data chunk")
    val n = dataLen / 2
    val windows = Seq.newBuilder[AudioWindow]
    var w = 0
    while (w * windowSamples < n) {
      val lo = w * windowSamples
      val hi = math.min(lo + windowSamples, n)
      var i = lo
      var sumSq = 0.0
      var peak = 0
      var crossings = 0L
      var prevSign = 0
      while (i < hi) {
        val o = dataOff + i * 2
        val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
        sumSq += s.toDouble * s.toDouble
        if (math.abs(s) > peak) peak = math.abs(s)
        val sign = Integer.signum(s)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
        }
        i += 1
      }
      windows += AudioWindow(docId, w, hi - lo,
        math.sqrt(sumSq / (hi - lo)), peak, crossings)
      w += 1
    }
    windows.result()
  }

  /** Minimal RIFF/WAVE encoder (16-bit mono PCM) — the write half of
    * `decodeWav`, used to round-trip synthesized fixtures through the
    * REAL container walk (q169 gates decode features against a
    * closed-form oracle over the same samples).
    */
  def encodeWav16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(36 + dataLen)
      .put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Batched audio features: one container walk + PCM pass per payload
    * inside `mapPartitions`, windows flat-mapped out — payload bytes
    * never cross the operator boundary, only the per-window rows.
    */
  def audioFeaturesBatched(media: DataFrame, windowSamples: Int): Dataset[AudioWindow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioFeatures(id, bytes, windowSamples)
      })
  }
}
