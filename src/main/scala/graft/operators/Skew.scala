package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins.
  *
  * At 100 TB a handful of hot keys (the power-law reality of user/track
  * plays in the reference's domain) can pin a shuffle join on a few
  * straggler tasks. Two tools:
  *
  * - AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) splits
  *   oversized shuffle partitions at runtime — prefer it when it applies
  *   (sort-merge joins with runtime stats).
  * - Explicit salting (below) for the cases AQE cannot rewrite: the
  *   fact side's hot key is sharded across `salts` sub-keys, and the
  *   (small) build side is replicated once per salt. Cost: build side
  *   × salts; benefit: the hot key's rows spread over `salts` tasks.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  private val SaltSeed = 0x5a17eDL

  /** Inner equi-join with the probe side salted. `dim` should be the
    * smaller side (it is replicated `salts` times).
    *
    * Salt assignment is a CONTENT hash of the fact row
    * (`pmod(xxhash64(cols…, seed), salts)`), not
    * `monotonically_increasing_id`: the id is recompute-nondeterministic
    * (a retried task can assign different salts than the lost attempt),
    * which makes shuffle outputs non-idempotent under speculative
    * execution and breaks bit-determinism across runs. A row hash is
    * deterministic per row and equally uniform — provided the fact
    * carries at least one per-row-varying column (an event/line id;
    * every real fact table does), since fully identical rows necessarily
    * share a salt.
    */
  /** The salt assignment itself — public so specs can pin its
    * recompute-determinism directly. `saltCols` names the columns whose
    * content distinguishes rows (an event/line id); empty means "hash
    * every column". The caveat with the full-row default: FULLY IDENTICAL
    * rows necessarily share a salt, so on a duplicate-heavy fact the hot
    * key's clones collapse onto one shard and the mitigation silently
    * degrades — which is why `saltedJoin` takes the distinguishing
    * columns EXPLICITLY instead of leaving that as an undocumented
    * caller obligation.
    */
  def saltExpr(fact: DataFrame, salts: Int,
               saltCols: Seq[String] = Nil): Column = {
    val cols = if (saltCols.nonEmpty) saltCols.map(col)
      else fact.columns.map(col).toIndexedSeq
    pmod(xxhash64(cols :+ lit(SaltSeed): _*), lit(salts.toLong))
  }

  /** @param saltCols columns that (together) distinguish the fact's rows
    *   — a line/event id; every real fact table has one. Passing them is
    *   what guarantees uniform salt spread even when rows are otherwise
    *   identical. Empty falls back to hashing the full row, documented
    *   above to degrade on exact-duplicate rows.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn(SaltCol, saltExpr(fact, salts, saltCols))
    val replicatedDim = dim.withColumn(SaltCol,
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(replicatedDim, Seq(key, SaltCol)).drop(SaltCol)
  }
}
