package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.NearDup
import graft.sources.Snapshots

/** Streaming near-duplicate dedup: a `foreachBatch` sink that admits each
  * micro-batch of documents only if they are not fuzzy duplicates of
  * anything already admitted — the streaming form of the corpus-level
  * MinHash-LSH dedup (reference analog: the silver layer's stateful
  * streaming `dropDuplicates`, local_spotify_dab/src/silver/
  * Silver_Dimensions.py:447 — generalized from exact keys to content
  * similarity).
  *
  * State is a signature INDEX, not the corpus: (doc_id, K-long MinHash
  * signature) — ~128 bytes/doc, so the per-batch work is one LSH band
  * join of the batch's signatures against the index plus one in-batch
  * pair pass. Text is shingled exactly once per document, ever; matching
  * re-derives band keys from stored signatures (cheap array folds).
  *
  * Drop rule (deterministic, non-iterative): a batch document is dropped
  * when its estimated Jaccard reaches `threshold` against (a) any
  * INDEXED document from an EARLIER batch, or (b) any earlier-id document
  * in the same batch. (b) is deliberately independent of the partner's
  * own fate — the standard streaming-dedup simplification that avoids an
  * in-batch convergence loop; chains over-drop slightly, never
  * under-drop. Restricting (a) to earlier batches (the anti-join on the
  * batch's own ids) keeps a crash-replayed batch — whose signatures may
  * already sit in the index — on the same rule as its first attempt.
  *
  * Write side is O(batch), not O(state): both stores are append-only
  * Snapshots logs — a batch commits only its admitted rows as a new
  * segment, prior segments carry forward by manifest reference, and the
  * batch id is the commit token that makes redelivery a no-op. Segment
  * counts are bounded by periodic log compaction (amortized).
  */
object StreamingNearDup {

  /** Compact a store once its log exceeds this many segments: each batch
    * adds one segment, so a compaction (one full state rewrite) runs every
    * `MaxLogSegments` batches — amortized O(state/MaxLogSegments) per
    * batch — and read fan-in stays bounded.
    */
  val MaxLogSegments = 32

  /** The sink. `indexPath` holds the signature index, `corpusPath` the
    * admitted documents; both are append-only Snapshots log stores.
    */
  def dedupSink(indexPath: String, corpusPath: String, idCol: String,
                textCol: String, n: Int, threshold: Double)
               (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // a store that exists but has only empty segments (every doc of every
    // batch so far was dropped) has no schema to read — same as absent
    def nonEmpty(path: String): Boolean =
      Snapshots.exists(spark, path) && Snapshots.totalRows(spark, path) > 0
    // a document re-sent in a LATER batch is already settled — only novel
    // ids are processed (ids-only anti-join against the corpus)
    val newDocs =
      if (nonEmpty(corpusPath))
        batch.join(Snapshots.read(spark, corpusPath).select(idCol), Seq(idCol), "left_anti")
      else batch
    val sigs = NearDup.minHashSignatures(newDocs, idCol, textCol, n)
    val inBatch = NearDup.minHashLshPairs(newDocs, idCol, textCol, n)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_b").as(idCol))
    val dropIds = (if (nonEmpty(indexPath)) {
      val ownIds = newDocs.select(col(idCol).as("index_id"))
      val vsIndex = NearDup.lshMatches(sigs, Snapshots.read(spark, indexPath), idCol)
        .filter(col("est_jaccard") >= threshold)
        .join(ownIds, Seq("index_id"), "left_anti")
        .select(idCol)
      inBatch.unionByName(vsIndex)
    } else inBatch).distinct()
    val kept = newDocs.join(dropIds, Seq(idCol), "left_anti")
    // index admits only matchable documents (those with a signature);
    // shingle-less docs live in the corpus but can never collide.
    // Index commits FIRST: a crash between the two commits replays into
    // the batch-aware drop rule above and converges to the same state.
    val keptSigs = sigs.join(dropIds, Seq(idCol), "left_anti")
    Snapshots.appendCommit(keptSigs, indexPath, batchId)
    Snapshots.appendCommit(kept, corpusPath, batchId)
    Snapshots.maybeCompactLog(spark, indexPath, MaxLogSegments)
    Snapshots.maybeCompactLog(spark, corpusPath, MaxLogSegments)
  }
}
