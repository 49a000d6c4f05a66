package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.LeanCheckpoint.Ops

/** PMI collocation mining (Church & Hanks): which adjacent word pairs
  * occur together far more often than their marginal frequencies
  * predict — the corpus-linguistics report that surfaces multi-word
  * units ("new york") and templated boilerplate next to the q53/q123
  * document-frequency views.
  *
  * Shape, and why it scales: the corpus is touched ONCE with a pure
  * map-side transform (slice + zip + explode of adjacent token pairs —
  * no join, no window), collapsed by one hash aggregation into the
  * bigram count table. Everything else — left/right marginals, the
  * grand total, the PMI ratio — is re-aggregated from that table,
  * whose size is bounded by the observed-bigram vocabulary, not the
  * corpus (map-side partial agg absorbs hot bigrams exactly as q53's
  * df counter does). There is no all-pairs structure anywhere, so no
  * df cap is NEEDED for safety; the marginal floor plays the
  * vocabulary-banding role (rare-word bigrams are noise at any PMI).
  *
  * Exactness: PMI = log2( n_ab·N / (n_left·n_right) ). The log is a
  * transcendental whose last ulp differs across libm builds, so the
  * gated output is the RATIO inside it (`pmi_lift`, monotone in PMI):
  * both products are computed in DECIMAL(38,0) — the q211 lesson:
  * token counts at the 100-TB scale reach ~1e14 and the products
  * ~1e28, past int64 — and the single double division of two exactly-
  * represented integers is correctly rounded identically in any IEEE
  * engine.
  *
  * Reference analog: the corpus-statistics family of
  * utilities/utils.py (token profiling) — the reference has no
  * collocation miner; this extends the text-analysis surface.
  */
object Collocations {

  /** Adjacent-bigram PMI table over `textCol` (whitespace tokens).
    *
    * @param minMarginal vocabulary band: both endpoint words must fill
    *                    at least this many bigram slots (left for the
    *                    left word, right for the right)
    * @param minPair     minimum bigram count (output noise floor)
    * @return (word_a, word_b, n_ab, n_left, n_right, pmi_lift)
    */
  /** The positional adjacent-bigram walk: one map-side slice+zip+explode
    * per document, (word_a, word_b) per bigram slot. Shared by the PMI
    * miner and the Kneser–Ney count tables.
    */
  def bigrams(docs: DataFrame, textCol: Column): DataFrame = {
    val ws = split(textCol, " ")
    docs
      .filter(textCol.isNotNull && size(ws) >= 2)
      .select(explode(arrays_zip(
        slice(ws, lit(1), size(ws) - 1).as("a"),
        slice(ws, lit(2), size(ws) - 1).as("b"))).as("p"))
      .select(col("p.a").as("word_a"), col("p.b").as("word_b"))
  }

  def bigramPmi(docs: DataFrame, textCol: Column,
                minMarginal: Long, minPair: Long): DataFrame = {
    val c = bigrams(docs, textCol)
      .groupBy(col("word_a"), col("word_b"))
      .agg(count(lit(1)).as("n_ab"))
    val la = c.groupBy(col("word_a")).agg(sum("n_ab").as("n_left"))
    val rb = c.groupBy(col("word_b")).agg(sum("n_ab").as("n_right"))
    val n = c.agg(sum("n_ab").as("n_total"))
    val d38 = DecimalType(38, 0)
    c.join(la, "word_a").join(rb, "word_b")
      .crossJoin(broadcast(n))
      .filter(col("n_left") >= minMarginal && col("n_right") >= minMarginal &&
        col("n_ab") >= minPair)
      .select(col("word_a"), col("word_b"),
        col("n_ab"), col("n_left"), col("n_right"),
        ((col("n_ab").cast(d38) * col("n_total").cast(d38)).cast("double") /
          (col("n_left").cast(d38) * col("n_right").cast(d38)).cast("double"))
          .as("pmi_lift"))
  }

  /** Multi-word collocation SPAN mining — the q225 merge machinery
    * driven by PMI lift instead of raw pair counts (VERDICT r13 item
    * 6): each round finds the adjacent word pair with the highest lift
    * n_ab·N/(n_a·n_b) over the CURRENT symbol sequences and merges its
    * occurrences into one unit, so n-ary spans ("new york city")
    * surface round over round instead of being invisible behind their
    * binary prefixes.
    *
    * Shape: the corpus folds ONCE into sentinel-wrapped symbol strings
    * (one per doc); each round is two hash-aggs over the adjacent-slot
    * table (bounded by the observed symbol-pair vocabulary) and a
    * 1-row argmax collect (the q225 driver bound); the merge is one
    * map-side `replace` — left-to-right non-overlapping in BOTH
    * engines (java String.replace ≡ DuckDB replace, the q225
    * contract). Merged units glue with U+0001 internally (words can't
    * contain it) and render with spaces in the output.
    *
    * Selection order must be exact and engine-portable, and lifts are
    * ratios — so the argmax key is the QUANTIZED lift
    * floor(n_ab·N·2^20 / (n_left·n_right)), computed in DECIMAL(38,0)
    * products (the q211/q215 overflow posture: counts at 100-TB scale
    * reach ~1e14 and the three-way product ~1e34) with `div`; ties
    * break (key DESC, a ASC, b ASC). The reported `lift` is the exact
    * double division of the two exact integer products, q215's form.
    */
  def collocationSpans(spark: org.apache.spark.sql.SparkSession,
                       docs: DataFrame, textCol: Column, rounds: Int,
                       minMarginal: Long, minPair: Long): DataFrame = {
    require(rounds >= 1, "span mining needs at least one round")
    var cur = docs.filter(textCol.isNotNull)
      .select(concat(lit(" "), textCol, lit(" ")).as("s"))
      .leanCheckpoint()
    val found = Seq.newBuilder[(Int, String, String, Long, Double)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val sy = expr("split(trim(s), ' ')")
      val c = cur
        .filter(size(sy) >= 2)
        .select(explode(arrays_zip(
          slice(sy, lit(1), size(sy) - 1).as("a"),
          slice(sy, lit(2), size(sy) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      val la = c.groupBy("a").agg(sum("n_ab").as("nl"))
      val rb = c.groupBy("b").agg(sum("n_ab").as("nr"))
      val nt = c.agg(sum("n_ab").as("nt"))
      val best = liftColumns(c.join(la, "a").join(rb, "b")
        .crossJoin(broadcast(nt))
        .filter(col("n_ab") >= minPair &&
          col("nl") >= minMarginal && col("nr") >= minMarginal))
        .orderBy(col("lift_key").desc, col("a"), col("b"))
        .limit(1)
        .select("a", "b", "n_ab", "lift")
        .collect() // bounded: at most ONE row per round
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, nab, lift) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2), best(0).getDouble(3))
        found += ((r, a.replace(Glue, " "), b.replace(Glue, " "), nab, lift))
        cur = cur.select(
          org.apache.spark.sql.functions.replace(col("s"),
            lit(s" $a $b "), lit(s" $a$Glue$b ")).as("s"))
          .leanCheckpoint()
      }
    }
    import spark.implicits._
    found.result()
      .toDF("round", "span_a", "span_b", "n_ab", "lift")
      .orderBy("round")
  }

  /** The span-selection arithmetic over a frame with count columns
    * (n_ab, nl, nr, nt): `lift_key` = floor(n_ab·nt·2²⁰ / (nl·nr)) in
    * DECIMAL(38,0) products (exact at 100-TB count scales, ~1e14 counts
    * / ~1e34 products) and `lift` = the exact double division of the
    * two exact integer products. Factored so the randomized spec can
    * plant 1e14-scale counts straight through the decimal arithmetic.
    */
  def liftColumns(counts: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    counts
      .withColumn("lift_key", expr(
        """(cast(n_ab as decimal(38,0)) * cast(nt as decimal(38,0))
           * 1048576) div
           (cast(nl as decimal(38,0)) * cast(nr as decimal(38,0)))"""))
      .withColumn("lift",
        (col("n_ab").cast(d38) * col("nt").cast(d38)).cast("double") /
          (col("nl").cast(d38) * col("nr").cast(d38)).cast("double"))
  }

  /** Internal glue for merged spans: a control char (U+0001) no
    * whitespace-tokenized word can contain; merged symbols carry it in
    * the working strings and render back to spaces in the output.
    */
  val Glue = "\u0001"

  /** Kneser–Ney continuation-count table — the statistic that makes KN
    * smoothing work: a word's unigram weight is not how OFTEN it occurs
    * but in how many distinct CONTEXTS it occurs ("Francisco" is
    * frequent but only ever follows "San", so its continuation count is
    * 1). Per word: token count, N1+(·w) distinct left contexts,
    * N1+(w·) distinct right continuations, and the continuation
    * probability P_cont(w) = N1+(·w) / N1+(··) — exact integers from
    * two hash-aggs over the distinct bigram-TYPE table, one division.
    * This is the LM-training count-table half of a data pipeline
    * (perplexity filtering's upstream); the bigram walk is shared with
    * the q215 PMI miner.
    */
  def kneserNeyCounts(docs: DataFrame, textCol: Column,
                      minTokens: Long): DataFrame = {
    val uni = docs.filter(textCol.isNotNull)
      .select(explode(split(textCol, " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_tokens"))
    val bt = bigrams(docs, textCol).distinct()
    val leftTypes = bt.groupBy(col("word_b").as("word"))
      .agg(count(lit(1)).as("n_left_types"))
    val rightTypes = bt.groupBy(col("word_a").as("word"))
      .agg(count(lit(1)).as("n_right_types"))
    val total = bt.agg(count(lit(1)).as("n_bigram_types"))
    uni.join(leftTypes, Seq("word"), "left")
      .join(rightTypes, Seq("word"), "left")
      .crossJoin(broadcast(total))
      .filter(col("n_tokens") >= minTokens)
      .select(col("word"), col("n_tokens"),
        coalesce(col("n_left_types"), lit(0L)).as("n_left_types"),
        coalesce(col("n_right_types"), lit(0L)).as("n_right_types"),
        // an all-singleton corpus has zero bigram types: there are no
        // contexts at all, so continuation mass is 0, never 0/0 = NaN
        when(col("n_bigram_types") === 0L, lit(0.0))
          .otherwise(coalesce(col("n_left_types"), lit(0L)).cast("double") /
            col("n_bigram_types").cast("double")).as("p_continuation"))
  }
}
