package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Eager local checkpoint WITHOUT the plan metadata that
  * `Dataset.localCheckpoint` folds into the resulting `LogicalRDD`
  * leaf (origin statistics + the rewritten constraint ExpressionSet —
  * see `LogicalRDD.fromDataset` in the Spark source).
  *
  * Iterated self-join loops (label propagation, BFS marking,
  * min-label fixpoints) compound that carried metadata round over
  * round: each round's leaf re-derives stats/constraints from a plan
  * whose leaves already carry rewritten metadata of every earlier
  * round. Measured on the q232 basket graph: per-round DRIVER time
  * grew ~2.5× per round at CONSTANT stage/task/record counts
  * (restricted sf0.01 verify 53 s → 695 s from this alone; AQE on/off
  * and `spark.sql.constraintPropagation.enabled=false` made no
  * difference because `fromDataset` captures regardless). With the
  * lean leaf the same loop is flat at ~0.3 s/round.
  *
  * Zero extra serde: rows stay InternalRow end to end, exactly like
  * `Dataset.localCheckpoint` (the `.copy()` mirrors Dataset.checkpoint
  * — operators reuse row buffers, so stored rows must be defensive
  * copies). The only thing lost vs the builtin is the preserved
  * output partitioning/ordering metadata — irrelevant to fixpoint
  * loops, whose every round re-shuffles on different keys anyway.
  *
  * Lives under `org.apache.spark.sql` to reach the `private[sql]`
  * `internalCreateDataFrame`; written from public Spark source
  * knowledge only.
  */
object LeanCheckpoint {

  /** Materialize `df` into executor storage and return a DataFrame
    * whose logical plan is a bare `LogicalRDD` leaf over the stored
    * rows — no origin stats, no origin constraints.
    */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager materialization (the localCheckpoint contract)
    cds.sparkSession.internalCreateDataFrame(rdd, cds.schema)
  }

  /** [[localCheckpoint]] in SERIALIZED storage, returning the persisted
    * RDD as an explicit lifetime handle. For loops whose round frames
    * are O(corpus) rather than O(keys) — q273's suffix ranking carries
    * ~0.5 G position rows at the 100× drill — the deserialized
    * `UnsafeRow` objects cost ~5× their serialized bytes in heap, and a
    * loop that keeps every round persisted OOMs (caught by the round-17
    * drill: 31 GB heap, executor death). MEMORY_AND_DISK_SER (set
    * BEFORE `localCheckpoint()`, which preserves a pre-set level and
    * only forces the disk bit) keeps each round at its wire size and
    * spills under pressure, and the handle lets the caller UNPERSIST
    * round k as soon as round k+1 has materialized. A localCheckpointed
    * RDD has no lineage — unpersist only when provably never read again
    * (the returned DataFrame fails, not recomputes, past that point).
    */
  def localCheckpointSer(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    rdd.localCheckpoint()
    rdd.count() // eager materialization (the localCheckpoint contract)
    (cds.sparkSession.internalCreateDataFrame(rdd, cds.schema), rdd)
  }

  /** `df.leanCheckpoint()` sugar — drop-in for the
    * `.localCheckpoint(true)` iteration discipline.
    */
  implicit class Ops(private val df: DataFrame) extends AnyVal {
    def leanCheckpoint(): DataFrame = LeanCheckpoint.localCheckpoint(df)
  }

  /** Materialize like [[localCheckpoint]] and, in the SAME job, return
    * the row count and the exact sum of long column `longCol` (BigInt —
    * no overflow whatever the ids). Fixpoint loops need a convergence
    * witness (label sum) and peel loops need a progress witness (row
    * count) immediately after every materialization; as two separate
    * actions that is 2× the job count of the loop, and at fixpoint
    * scale the sequential job latency IS the cost (measured on the
    * q232 SCC: phase wall ∝ jobs, not rows). The fold rides the
    * materializing action itself, so the witness is free. Exactness:
    * the values are the action's RESULT (not accumulators), so task
    * retries cannot double-count.
    */
  def localCheckpointSummed(df: DataFrame,
                            longCol: String): (DataFrame, Long, BigInt) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val idx = cds.schema.fieldIndex(longCol)
    require(cds.schema(idx).dataType ==
      org.apache.spark.sql.types.LongType,
      s"localCheckpointSummed needs a LongType column, got " +
        s"${cds.schema(idx).dataType} for '$longCol'")
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    // an action on the derived RDD computes (and thereby persists) the
    // checkpointed parent's partitions — same materialization contract
    // as the count() in localCheckpoint above
    val (cnt, sm) = rdd.mapPartitions { it =>
      var c = 0L
      var s = BigInt(0)
      it.foreach { r => c += 1; if (!r.isNullAt(idx)) s += r.getLong(idx) }
      Iterator.single((c, s))
    }.fold((0L, BigInt(0))) { case ((c1, s1), (c2, s2)) => (c1 + c2, s1 + s2) }
    (cds.sparkSession.internalCreateDataFrame(rdd, cds.schema), cnt, sm)
  }
}
