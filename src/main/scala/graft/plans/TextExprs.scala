package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Unicode text-normalization kernel: ROOT-locale case folding
  * followed by NFC composition, as one codegen'd expression.
  *
  * Real crawl corpora arrive with mixed case, precomposed AND decomposed
  * accents ("é" vs "e"+U+0301), and non-Latin scripts; every downstream
  * text operator (tokens, shingles, language ID, dedup fingerprints) must
  * see one canonical form or near-identical documents hash apart. ASCII
  * input short-circuits to a byte-level lowercase with no transcoding, so
  * the pre-tokenized ASCII path keeps its cost.
  *
  * Cross-engine contract (the DuckDB oracle states
  * `nfc_normalize(lower(s))`): Locale.ROOT lowercasing + NFC matches
  * DuckDB's utf8proc pipeline on simple one-to-one case mappings — which
  * is all of Latin-1/Latin-Extended accents, Cyrillic, Greek-minus-sigma.
  * Context-sensitive mappings (final sigma, Turkish dotted I) differ
  * between full and simple case folding across engines and are excluded
  * from the verified contract.
  */
object TextExprs {

  def nfcCaseFold(c: Column): Column =
    GraftColumnBridge.column(NfcCaseFold(GraftColumnBridge.expression(c)))

  /** Runtime twin shared by the interpreted and generated paths. */
  def nfcCaseFoldJava(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      // ASCII fast path: case fold is a byte map, NFC is the identity
      val out = new Array[Byte](bytes.length)
      var j = 0
      while (j < bytes.length) {
        val b = bytes(j)
        out(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        j += 1
      }
      UTF8String.fromBytes(out)
    } else {
      val folded = s.toString.toLowerCase(java.util.Locale.ROOT)
      val norm =
        if (java.text.Normalizer.isNormalized(folded, java.text.Normalizer.Form.NFC)) folded
        else java.text.Normalizer.normalize(folded, java.text.Normalizer.Form.NFC)
      UTF8String.fromString(norm)
    }
  }
}

case class NfcCaseFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"NfcCaseFold requires a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    TextExprs.nfcCaseFoldJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TextExprs.nfcCaseFoldJava($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcCaseFold =
    copy(child = newChild)
}
