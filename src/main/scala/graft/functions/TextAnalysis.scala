package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-training-data pipelines: tokenization,
  * n-gram shingling, language-ID scoring, quality ratios, and rolling-hash
  * fingerprints.
  *
  * Everything here is built from codegen'd higher-order functions
  * (`transform` / `filter` / `aggregate`) and scalar expressions — no UDFs —
  * so the whole family stays inside whole-stage codegen and scales as a
  * pure projection (zero shuffles; at 100 TB these run at scan speed).
  *
  * Cross-engine determinism: every float emitted is produced by the same
  * sequential left-to-right fold / IEEE op order the DuckDB oracle uses
  * (`list_reduce` ≡ `aggregate`), so results are bit-identical, not just
  * "close".
  */
object TextAnalysis {

  /** Whitespace tokens. The corpus is single-space separated; a production
    * corpus would use `split(text, "\\s+")` — same plan shape. Multilingual
    * crawl text goes through `normalized` + `unicodeWords` first (q54);
    * this fast path assumes pre-normalized single-script input.
    */
  def words(text: Column): Column = split(text, " ")

  /** Canonical text form for multilingual corpora: ROOT case fold + NFC
    * composition (codegen kernel, ASCII byte fast path). Put this in front
    * of any words/shingles/fingerprint pipeline fed by real crawl text —
    * decomposed accents ("e"+U+0301) and case variants otherwise hash
    * apart in every dedup operator.
    */
  def normalized(text: Column): Column = graft.plans.TextExprs.nfcCaseFold(text)

  /** Unicode-aware tokens: maximal runs of letters/digits in any script
    * (`\p{L}\p{N}` is the Java-regex/RE2 intersection, so the DuckDB
    * oracle states the identical class). Apply to `normalized` text.
    */
  def unicodeWords(text: Column): Column =
    regexp_extract_all(text, lit("[\\p{L}\\p{N}]+"), lit(0))

  /** Word n-gram shingles (overlapping windows of `n` words re-joined with
    * spaces). `sequence` + `element_at` keeps it a pure array expression.
    */
  def ngrams(ws: Column, n: Int): Column =
    // Guard: Spark sequence(1, stop) DESCENDS for stop < 1 (it would yield
    // [1,0], not []) — documents shorter than n words must give no shingles.
    when(size(ws) >= n,
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens in `stop` (frequency, not set membership). */
  def stopwordCount(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isin(stop.map(lit): _*)))

  /** Sum of token lengths via a sequential fold (bit-identical to DuckDB
    * `list_reduce`).
    */
  def totalWordLen(ws: Column): Column =
    aggregate(transform(ws, w => length(w).cast("long")), lit(0L), (acc, x) => acc + x)

  /** Rolling polynomial hash over the document's bytes:
    * `acc = (acc * 31 + byte) mod 1e9+7` — the classic Rabin-Karp document
    * fingerprint, implemented as a custom codegen'd kernel
    * (graft.plans.PolyFingerprint; a per-character HOF fold would be
    * interpreted). On ASCII corpora `byte == ascii(char)`, matching the
    * oracle's character-level formulation exactly.
    */
  def rollingFingerprint(text: Column): Column =
    graft.plans.VectorExprs.polyFingerprint(text)

  /** Per-language stopword profiles for the language-ID heuristic. Small
    * high-frequency function words per language; an honest heuristic (on a
    * synthetic shared-vocabulary corpus most profiles score zero, which is
    * exactly what a profile-based classifier should report).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "es" -> Seq("el", "los", "y", "las", "una", "es", "no"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai"))

  /** Predicted language = argmax of profile scores with a deterministic
    * first-wins tie-break in `LangProfiles` declaration order (expressed as
    * a CASE cascade so the DuckDB oracle states the identical rule).
    */
  def langPredict(ws: Column): Column = {
    val scores = LangProfiles.map { case (lang, prof) => lang -> stopwordCount(ws, prof) }
    scores.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, s), i), rest) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        if (laterScores.isEmpty) rest
        else when(laterScores.map(o => s >= o).reduce(_ && _), lit(lang)).otherwise(rest)
    }
  }
}
