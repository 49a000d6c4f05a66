package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
        (coalesce(col("n_left_types"), lit(0L)).cast("double") /
          col("n_bigram_types").cast("double")).as("p_continuation"))
  }
}
