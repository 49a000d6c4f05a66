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
  * INDEXED document, or (b) any earlier-id document in the same batch.
  * (b) is deliberately independent of the partner's own fate — the
  * standard streaming-dedup simplification that avoids an in-batch
  * convergence loop; chains over-drop slightly, never under-drop.
  *
  * Replay idempotent: both the corpus and the index are committed
  * through [[graft.sources.Snapshots]] as id-deduplicated unions, and
  * self-matches (same doc_id) are excluded from the index rule, so a
  * re-delivered batch re-derives the same state.
  */
object StreamingNearDup {

  /** The sink. `indexPath` holds the signature index, `corpusPath` the
    * admitted documents; both are Snapshots stores.
    */
  def dedupSink(indexPath: String, corpusPath: String, idCol: String,
                textCol: String, n: Int, threshold: Double)
               (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val sigs = NearDup.minHashSignatures(batch, idCol, textCol, n)
    val inBatch = NearDup.minHashLshPairs(batch, idCol, textCol, n)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_b").as(idCol))
    val dropIds = (if (Snapshots.exists(spark, indexPath)) {
      val vsIndex = NearDup.lshMatches(sigs, Snapshots.read(spark, indexPath), idCol)
        .filter(col("est_jaccard") >= threshold && col("index_id") =!= col(idCol))
        .select(idCol)
      inBatch.unionByName(vsIndex)
    } else inBatch).distinct()
    val kept = batch.join(dropIds, Seq(idCol), "left_anti")
    val corpus =
      if (Snapshots.exists(spark, corpusPath))
        Snapshots.read(spark, corpusPath).unionByName(kept).dropDuplicates(idCol)
      else kept
    Snapshots.commit(corpus, corpusPath)
    // index admits only matchable documents (those with a signature);
    // shingle-less docs live in the corpus but can never collide
    val keptSigs = sigs.join(dropIds, Seq(idCol), "left_anti")
    val index =
      if (Snapshots.exists(spark, indexPath))
        Snapshots.read(spark, indexPath).unionByName(keptSigs).dropDuplicates(idCol)
      else keptSigs
    Snapshots.commit(index, indexPath)
  }
}
