package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LeanCheckpoint

/** Exact repeated-substring detection — the true Lee et al. 2021
  * ExactSubstr operator (their single-node form is a suffix array over
  * the concatenated corpus; this is the shuffle-native equivalent),
  * CHARACTER-level and quantization-free where q125's word-K-gram form
  * misses any repeat that is shorter than K words or not aligned to
  * word boundaries.
  *
  * Semantics: a character position is COVERED when its length-L window
  * (starting there) occurs ≥ 2 times anywhere in the corpus (within- or
  * cross-document — a verbatim self-repeat is the same memorization
  * risk); covered positions merge into maximal spans per document
  * (the removal mask ExactSubstr dedup cuts out). L must be a power
  * of two.
  *
  * Plan shape — the 100 TB argument: ranks only ever feed EQUALITY
  * tests, so any injective encoding of the L-window works. Two regimes
  * (chosen per corpus from one cheap max-code-point probe):
  *
  *  - DIRECT PACK (the gated geometry): when the window packs into at
  *    most [[DirectSeedMaxLongs]] int64s at `bits` bits per code point
  *    (ASCII at L = 16: two longs), the rank IS the packed window —
  *    computed map-side by the codegen kernel (plans/PackExprs), no
  *    ranking shuffles at all. The only O(corpus positions) exchange
  *    left is the multiplicity count, and the shuffled key (~16-32 B)
  *    costs the same as ONE round of the doubling form used to. This is
  *    NOT the naive substring-key plan the doubling form replaced: that
  *    one ships L bytes per position (16× blow-up at large L) — the
  *    pack regime is entered only when the key stays within ~4 words.
  *
  *  - PREFIX DOUBLING (wide code points or large L): rank_m(p) seeds
  *    from the widest single-long pack (m code points); round k assigns
  *    each position the GROUP ID of the pair (rank(p), rank(p + off))
  *    — two ranks equal iff the doubled windows are equal (induction:
  *    injective pair→id map) — so after log2(L/m) rounds equal ranks ⟺
  *    equal L-windows, and every exchange carries 8-byte integers:
  *    three hash-partitioned equi-shuffles per round, no global sort,
  *    no driver state.
  *
  * Per-document work is bounded by `maxChars` (the bounded-prefix
  * discipline the verdict prescribed; repeats beyond the cap belong to
  * the next shard's pass).
  */
object SuffixSpans {

  /** Position-id encoding: pid = doc_id · 2^20 + pos. */
  private val PosEnc = 1L << 20

  /** Direct-pack regime bound: rank keys up to this many int64s skip
    * the doubling loop outright (ASCII L=16 → 2, Latin-1 → 3; CJK/astral
    * corpora fall back to doubling).
    */
  private val DirectSeedMaxLongs = 4

  /** The previous doubling-path call's persisted hits frame. Each such
    * call leaves exactly one checkpointed RDD alive (its result
    * re-evaluates from it); a bench/suite that invokes the operator
    * repeatedly would otherwise strand one frame per invocation for the
    * JVM's lifetime, squeezing every LATER query's storage memory. A
    * NEW call unpersists the previous call's frame — by then its result
    * has been consumed (the operator is eager; callers evaluate before
    * re-invoking), and a stale handle failing fast beats a silent heap
    * leak. The direct-pack path needs no checkpoints at all (its plan
    * is one linear chain), so it neither registers nor strands anything.
    */
  private var prevCall: org.apache.spark.rdd.RDD[_] = null

  /** (doc_id, span_start, span_end, span_chars): maximal merged spans
    * of positions whose length-`windowLen` window repeats (≥ 2
    * occurrences corpus-wide). Positions are 1-based characters of the
    * first `maxChars` of `textCol`.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    windowLen: Int, maxChars: Int): DataFrame = {
    require(windowLen >= 2 && (windowLen & (windowLen - 1)) == 0,
      s"windowLen must be a power of two, got $windowLen")
    // maxChars + windowLen ≤ PosEnc, not just maxChars < PosEnc: the
    // doubling path forms rank pairs at pid − off for offsets up to
    // windowLen/2, and the pid encoding doc_id·PosEnc + i only stays
    // injective across documents when i + off can never wrap past
    // PosEnc — otherwise an early position of doc D aliases a valid
    // position of doc D−1 and cross-document rank pairs corrupt spans
    // (ADVICE r18 item 1; previously unenforced headroom).
    require(maxChars >= windowLen && maxChars <= PosEnc - windowLen,
      s"maxChars must be in [$windowLen, ${PosEnc - windowLen}], got $maxChars")
    // a new call releases the previous doubling call's stranded frame
    SuffixSpans.synchronized {
      if (prevCall != null) { prevCall.unpersist(blocking = false); prevCall = null }
    }
    val d = docs
      .select(col(idCol).cast("long").as("doc_id"),
        substring(col(textCol), 1, maxChars).as("t"))
      .filter(col("t").isNotNull && length(col("t")) >= windowLen)
    // one cheap probe scan: the corpus's max code point sizes the pack
    // base (every code point must fit in `bits` bits for injectivity)
    val probe = d.agg(max(graft.plans.PackExprs.maxCodePoint(col("t")))).head()
    val maxCode = if (probe.isNullAt(0)) 127 else math.max(1, probe.getInt(0))
    val bits = 32 - Integer.numberOfLeadingZeros(maxCode)
    val hits =
      if (graft.plans.PackExprs.blocksFor(windowLen, bits) <= DirectSeedMaxLongs)
        directHits(d, windowLen, bits)
      else
        doublingHits(d, windowLen, bits)
    // q125's gaps-and-islands merge on character coverage
    val wDo = Window.partitionBy("doc_id").orderBy("i")
    val prevEnd = max(col("e"))
      .over(wDo.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__new",
        when(col("i") > coalesce(prevEnd, lit(-1L)) + 1, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(wDo))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("i")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_chars"))
      .orderBy("doc_id", "span_start")
  }

  /** Direct-pack regime: rank = the packed L-window itself (map-side
    * kernel), one multiplicity-count exchange, zero checkpoints.
    */
  private def directHits(d: DataFrame, windowLen: Int, bits: Int): DataFrame = {
    val wR = Window.partitionBy("rk")
    d.select(col("doc_id"),
        posexplode(graft.plans.PackExprs.packedWindows(col("t"), windowLen, bits))
          .as(Seq("p0", "rk")))
      .withColumn("__n", count(lit(1)).over(wR))
      .filter(col("__n") >= 2)
      // p0 is posexplode's INT ordinal — widen so the span schema stays
      // LongType, identical to the doubling path's pid arithmetic
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("i"))
      .withColumn("e", col("i") + (windowLen - 1))
  }

  /** Prefix-doubling regime for corpora whose packed window key would
    * exceed [[DirectSeedMaxLongs]] longs: seed at the widest power-of-two
    * single-long pack, double to `windowLen`.
    */
  private def doublingHits(d: DataFrame, windowLen: Int, bits: Int): DataFrame = {
    // Round frames are O(corpus CHARACTERS) — at the 100× drill ~0.25 G
    // rows — so unlike the O(keys) fixpoint loops this loop must manage
    // its checkpoint lifetimes: serialized storage (wire-size heap, disk
    // spill under pressure) and round k unpersisted the moment round
    // k+1 has materialized (safe: a round is never read after its
    // successor exists). Keeping all rounds deserialized was a
    // drill-caught OOM (31 GB heap, executor death at 100×).
    var live: org.apache.spark.rdd.RDD[_] = null
    def ckpt(df: DataFrame): DataFrame = {
      val (out, handle) = LeanCheckpoint.localCheckpointSer(df)
      if (live != null) live.unpersist(blocking = false)
      live = handle
      out
    }
    // seed: the widest power-of-two pack that fits one long (m ≥ 1;
    // windowLen is a power of two, so m divides it and the doubling
    // lands exactly on windowLen). every loop frame is exactly TWO
    // longs: pid = doc·2^20 + pos (pos 1-based, pos + off can never
    // cross a document boundary since maxChars + windowLen < 2^20), rk
    // the current rank — the pair join is a single-long-key self-join
    // on pid, and the shuffles carry 16 bytes per position instead of a
    // (doc, pos, pid, rank) tuple.
    var m = 1
    while (m * 2 * bits <= 62 && m * 2 <= windowLen) m *= 2
    var r = ckpt(d
      .select(col("doc_id"),
        posexplode(graft.plans.PackExprs.packedWindows(col("t"), m, bits))
          .as(Seq("p0", "rk1")))
      .select((col("doc_id") * PosEnc + col("p0") + 1).as("pid"),
        element_at(col("rk1"), 1).as("rk")))
    var off = m
    while (off < windowLen) {
      // position p pairs with p + off; the inner join drops positions
      // whose doubled window would run past the document end
      val b = r.select((col("pid") - off).as("pid"), col("rk").as("rk2"))
      val pairs = r.join(b, "pid")
      val gid = pairs.groupBy("rk", "rk2").agg(min("pid").as("g"))
      r = ckpt(pairs.join(gid, Seq("rk", "rk2"))
        .select(col("pid"), col("g").as("rk")))
      off *= 2
    }
    // repeated L-windows: rank classes with ≥ 2 members (one exchange
    // on the integer rank — q125's windowed count, never a join-back).
    // The hits frame is O(repeated positions) ≪ corpus — checkpoint IT,
    // then free the final O(corpus) rank frame; downstream (island
    // merge) re-evaluates only ever read the small persisted hits.
    val wR = Window.partitionBy("rk")
    val hits = ckpt(r.withColumn("__n", count(lit(1)).over(wR))
      .filter(col("__n") >= 2)
      .select(expr(s"pid div $PosEnc").as("doc_id"),
        pmod(col("pid"), lit(PosEnc)).as("i"))
      .withColumn("e", col("i") + (windowLen - 1)))
    SuffixSpans.synchronized { prevCall = live } // = the hits handle
    hits
  }
}
