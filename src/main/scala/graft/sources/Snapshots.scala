package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe parquet snapshot store: a manifest-pointer commit protocol
  * with never-zero live copies.
  *
  * The reference's gold layer gets this from Delta's transaction log
  * (reference: local_spotify_dab/src/gold/spotify_etl/transformations/
  * FactStream.py:96-105 — `create_auto_cdc_flow` over Delta tables). The
  * parquet-only analog here borrows the same idea at its minimum viable
  * size: data files are immutable, and a tiny monotonically-numbered
  * manifest file is the single commit point.
  *
  * Layout under `target/`:
  * {{{
  *   _manifests/00000007     # text file, content = "snap-00000007"
  *   snap-00000007/...       # a complete parquet snapshot
  * }}}
  *
  * Commit protocol (`commit` = the three steps in order):
  *  1. `writeSnapshot` — write the new snapshot dir `snap-<v+1>`. Readers
  *     are unaffected: the manifest still points at `<v>`.
  *  2. `publish` — create manifest `<v+1>` (written to a dot-temp file
  *     and renamed into place; a single-file rename/PUT is the atom).
  *     THIS is the commit point: readers resolve `max(manifest)` and see
  *     the new snapshot, old readers of `<v>` are undisturbed.
  *  3. `gc` — delete snapshots and manifests below the current version.
  *
  * A crash between any two steps leaves a fully-readable store: before
  * publish the old snapshot is current (the orphaned `snap-<v+1>` is
  * overwritten by the next attempt); after publish the new one is, and
  * the stale files are garbage-collected by the next commit. Unlike
  * delete-then-rename stage-and-swap there is NO window with zero live
  * copies, and nothing relies on directory-rename atomicity — which
  * object stores do not provide.
  */
object Snapshots {

  private val ManifestDir = "_manifests"

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(target: String) = new Path(target, ManifestDir)

  private def fmt(v: Long): String = f"$v%08d"

  /** Highest published version, if any commit has completed. */
  def currentVersion(spark: SparkSession, target: String): Option[Long] = {
    val fs = fsOf(spark, target)
    val dir = manifestPath(target)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(_.forall(_.isDigit)).map(_.toLong).toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** True once at least one commit has been published. */
  def exists(spark: SparkSession, target: String): Boolean =
    currentVersion(spark, target).isDefined

  /** Read the current snapshot (the one the highest manifest points at). */
  def read(spark: SparkSession, target: String): DataFrame = {
    val v = currentVersion(spark, target).getOrElse(
      throw new IllegalStateException(s"no published snapshot at $target"))
    val fs = fsOf(spark, target)
    val in = fs.open(new Path(manifestPath(target), fmt(v)))
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    spark.read.parquet(new Path(target, name).toString)
  }

  /** Step 1: write the next version's snapshot dir (invisible to readers).
    * Returns the version it is staged as.
    */
  def writeSnapshot(df: DataFrame, target: String): Long = {
    val spark = df.sparkSession
    val v = currentVersion(spark, target).getOrElse(0L) + 1
    df.write.mode("overwrite")
      .parquet(new Path(target, s"snap-${fmt(v)}").toString)
    v
  }

  /** Step 2 — the commit point: publish version `v` by creating its
    * manifest. The content is staged in a dot-file (readers ignore those)
    * and renamed into place so no reader can observe a half-written
    * manifest.
    */
  def publish(spark: SparkSession, target: String, v: Long): Unit = {
    val fs = fsOf(spark, target)
    val dir = manifestPath(target)
    val tmp = new Path(dir, s".tmp-${fmt(v)}")
    val out = fs.create(tmp, true)
    try out.write(s"snap-${fmt(v)}".getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(dir, fmt(v))))
      throw new java.io.IOException(s"could not publish manifest $v at $target")
  }

  /** Step 3: delete snapshots and manifests older than the PREVIOUS
    * version. Retaining one superseded snapshot (so the store is bounded
    * at two) gives in-flight readers that resolved the old manifest just
    * before a commit a grace window — the same reason transaction-log
    * table formats retain superseded files for a spell.
    */
  def gc(spark: SparkSession, target: String): Unit =
    currentVersion(spark, target).foreach { cur =>
      val fs = fsOf(spark, target)
      fs.listStatus(new Path(target)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("snap-") && n.stripPrefix("snap-").toLong < cur - 1)
          fs.delete(st.getPath, true)
      }
      fs.listStatus(manifestPath(target)).foreach { st =>
        val n = st.getPath.getName
        if ((n.forall(_.isDigit) && n.toLong < cur - 1) || n.startsWith(".tmp-"))
          fs.delete(st.getPath, false)
      }
    }

  /** Full commit: stage, publish, collect garbage. */
  def commit(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val v = writeSnapshot(df, target)
    publish(spark, target, v)
    gc(spark, target)
  }
}
