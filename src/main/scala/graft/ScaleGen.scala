package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Deterministic corpus scale-up for the second decade of the scaling
  * curve. No sf1 dataset ships in this environment, so this derives an
  * sf1-EQUIVALENT `documents`/`embeddings` pair from sf0.1 by replication
  * under structure-preserving, collision-free transforms; every other
  * table is copied through unchanged. Bench tooling — not part of the
  * query surface.
  *
  * Why replication instead of fresh sampling: the scaling fit compares
  * the SAME query at two corpus sizes, so the scaled corpus must keep
  * the sf0.1 distributions (words/doc, near-dup density, df shape,
  * embedding isotropy) while growing row count 10×. The transforms
  * below make each replica internally IDENTICAL to the original and
  * mutually non-colliding:
  *
  *  - documents: replica i > 0 suffixes every word with a replica tag.
  *    Within-replica shingle/minhash/simhash/prefix structure is exactly
  *    the original's (the transform is a vocabulary bijection), while
  *    cross-replica n-gram collisions are impossible — 10× rows and 10×
  *    the planted dup structure, no new hot shingles. `n_chars` is
  *    recomputed so length-derived features stay consistent.
  *  - embeddings: replica i > 0 applies a cyclic coordinate shift plus
  *    per-coordinate sign flips — an orthogonal map, so norms and all
  *    within-replica cosines are preserved exactly, while cross-replica
  *    cosines sit at the isotropic noise floor of the corpus.
  *  - orders/lineitem: replica i > 0 offsets the order key (the fact
  *    identity) while keeping dim keys (custkey/partkey/suppkey) and all
  *    dates — the realistic scale-up shape: facts grow 10×, dims stay
  *    fixed, per-dim-key fan-out grows 10× with identical distribution.
  *  - events: replica i > 0 offsets event_id and user_id, preserving ts —
  *    each replica user carries the original user's exact event timeline,
  *    so sessions-per-user and gap structure replicate instead of 10
  *    timelines collapsing into one user's (which would merge sessions).
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <destDir> [factor=10]
  */
object ScaleGen {

  /** doc_id / vec_id stride between replicas; far above any real id. */
  val IdStride = 10000000L

  def scaleDocuments(df: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      if (i == 0) df
      else {
        val tag = s"x$i"
        val text = array_join(
          transform(split(col("text"), " "), w => concat(w, lit(tag))), " ")
        df.withColumn("doc_id", col("doc_id") + lit(i * IdStride))
          .withColumn("text", text)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }.reduce(_.unionByName(_))

  def scaleEmbeddings(df: DataFrame, factor: Int, dim: Int): DataFrame =
    (0 until factor).map { i =>
      if (i == 0) df
      else {
        val shift = (i * 7) % dim
        // Deterministic ±1 per (replica, coordinate): a fixed LCG-style
        // mix, no RNG state — reruns are bit-identical.
        val rotated = (0 until dim).map { j =>
          val sign = if ((((j * 2654435761L + i * 40503L) >>> 13) & 1L) == 0L) 1f else -1f
          (col("embedding")((j + shift) % dim) * lit(sign)).cast(FloatType)
        }
        df.withColumn("vec_id", col("vec_id") + lit(i * IdStride))
          .withColumn("embedding", array(rotated: _*).cast(ArrayType(FloatType)))
      }
    }.reduce(_.unionByName(_))

  /** Key-offset replication: bump each column in `keyCols` by the replica
    * stride, pass everything else through. A bijection on the offset keys,
    * identity on the rest — within-replica join/window structure is exactly
    * the original's.
    */
  def scaleByKeyOffset(df: DataFrame, factor: Int, keyCols: Seq[String]): DataFrame =
    (0 until factor).map { i =>
      if (i == 0) df
      else keyCols.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(i * IdStride)))
    }.reduce(_.unionByName(_))

  def scaleOrders(df: DataFrame, factor: Int): DataFrame =
    scaleByKeyOffset(df, factor, Seq("o_orderkey"))

  def scaleLineitem(df: DataFrame, factor: Int): DataFrame =
    scaleByKeyOffset(df, factor, Seq("l_orderkey"))

  def scaleEvents(df: DataFrame, factor: Int): DataFrame =
    scaleByKeyOffset(df, factor, Seq("event_id", "user_id"))

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Spark's parquet writer defaults to INT96 timestamps; pin MICROS so
      // scaled copies of MICROS-era fixtures carry the same physical
      // annotation as the source (both re-detect as TsMicros either way,
      // but the written contract should match the stated one).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest))
    scaleDocuments(Tables.documents(spark, src), factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")
    val dim = Tables.embeddings(spark, src)
      .select(size(col("embedding"))).first().getInt(0)
    scaleEmbeddings(Tables.embeddings(spark, src), factor, dim)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")
    // Fact tables for the ETL/star family's second decade.
    scaleOrders(spark.read.parquet(s"$src/orders.parquet"), factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/orders.parquet")
    scaleLineitem(spark.read.parquet(s"$src/lineitem.parquet"), factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/lineitem.parquet")
    // events.ts format follows the source fixtures (Tables.eventsTsUnit
    // detects TIMESTAMP(MICROS) vs TIMESTAMP(NANOS)). MICROS sources copy
    // through as native TimestampType (written back as TIMESTAMP(MICROS),
    // which Tables.events re-detects); NANOS sources copy as raw INT64
    // nanos, which the long-read path picks up. The scaled dir feeds Bench
    // only, never the DuckDB oracle.
    val evSrc = Tables.eventsTsUnit(spark, src) match {
      case Tables.TsMicros => Tables.events(spark, src)
      case Tables.TsNanos  => Tables.eventsRawNanos(spark, src)
    }
    scaleEvents(evSrc, factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/events.parquet")

    // Pass the remaining (dim) tables through so the dest dir is a complete
    // SF directory any tool (Bench, Verify) can point at.
    val scaled = Set("documents.parquet", "embeddings.parquet",
      "orders.parquet", "lineitem.parquet", "events.parquet")
    val srcDir = new java.io.File(src)
    srcDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .filterNot(f => scaled(f.getName))
      .foreach { f =>
        val out = java.nio.file.Paths.get(dest, f.getName)
        if (!java.nio.file.Files.exists(out)) {
          if (f.isDirectory) {
            spark.read.parquet(f.getPath).write.mode("overwrite")
              .parquet(out.toString)
          } else {
            java.nio.file.Files.copy(f.toPath, out)
          }
        }
      }
    println(s"""{"scaled":"$src -> $dest","factor":$factor}""")
    spark.stop()
  }

  /** Graph-drill variant (`runMain graft.ScaleGenGraph src dest factor`):
    * lineitem replicated with BOTH l_orderkey and l_partkey offset, all
    * other tables passed through unchanged. Rationale: the co-purchase
    * graph has the ITEM CATALOG as its vertex set, and `scaleLineitem`
    * (facts-only offset) holds that set fixed while basket count grows —
    * at 100× the pair table saturates toward the complete graph on 20k
    * parts, which is a density regime no real 100× corpus is in (a 100×
    * catalog grows too). Offsetting both keys yields `factor` disjoint
    * copies of the original graph — the structure-preserving scale-up
    * the graph family's exponents should be fitted on (same reasoning as
    * scaleEvents preserving per-user timelines).
    */
  def graphMain(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // fail up front on a missing/non-local src: listFiles() below would
    // return null and NPE after work was already done (matches scaleMain)
    val srcDir = new java.io.File(src)
    require(srcDir.isDirectory,
      s"ScaleGenGraph src must be a local testdata directory, got $src")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest))
    scaleByKeyOffset(spark.read.parquet(s"$src/lineitem.parquet"), factor,
        Seq("l_orderkey", "l_partkey"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/lineitem.parquet")
    srcDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        f.getName != "lineitem.parquet")
      .foreach { f =>
        val out = java.nio.file.Paths.get(dest, f.getName)
        if (!java.nio.file.Files.exists(out)) {
          if (f.isDirectory)
            spark.read.parquet(f.getPath).write.mode("overwrite")
              .parquet(out.toString)
          else { java.nio.file.Files.copy(f.toPath, out); () }
        }
      }
    println(s"""{"graph_scaled":"$src -> $dest","factor":$factor}""")
    spark.stop()
  }
}

object ScaleGenGraph {
  def main(args: Array[String]): Unit = ScaleGen.graphMain(args)
}

/** Lineitem-only facts scaler (`runMain graft.ScaleGenLineitem src dest
  * factor`): lineitem replicated with l_orderkey offset (per-part
  * chains grow `factor`× DEEPER — the q210 FIFO drill regime, where
  * per-key cumulative totals cross many bucket widths), every other
  * table passed through. Much cheaper than scaleMain when only the
  * lineitem family is under drill (no document/embedding blow-up).
  * ALWAYS scale from the ORIGINAL fixture dir: offsets are i·IdStride,
  * so re-scaling an already-scaled dir collides keys.
  */
object ScaleGenLineitem {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val srcDir = new java.io.File(src)
    require(srcDir.isDirectory,
      s"ScaleGenLineitem src must be a local testdata directory, got $src")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest))
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    // Detect an already-scaled source instead of relying on the scaladoc:
    // offsets are i·IdStride, so replicating a dir whose keys already
    // reach the stride would collide replica 1's keys with the source's
    // replica 1 — silently corrupting per-key chains.
    val maxKey = li.agg(org.apache.spark.sql.functions.max("l_orderkey"))
      .collect()(0).getLong(0)
    require(maxKey < ScaleGen.IdStride,
      s"$src looks already scaled (max l_orderkey $maxKey >= IdStride " +
        s"${ScaleGen.IdStride}): replica offsets would collide — always " +
        "scale from the ORIGINAL fixture dir")
    ScaleGen.scaleLineitem(li, factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dest/lineitem.parquet")
    srcDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        f.getName != "lineitem.parquet")
      .foreach { f =>
        val out = java.nio.file.Paths.get(dest, f.getName)
        if (!java.nio.file.Files.exists(out)) {
          if (f.isDirectory)
            spark.read.parquet(f.getPath).write.mode("overwrite")
              .parquet(out.toString)
          else { java.nio.file.Files.copy(f.toPath, out); () }
        }
      }
    println(s"""{"lineitem_scaled":"$src -> $dest","factor":$factor}""")
    spark.stop()
  }
}
