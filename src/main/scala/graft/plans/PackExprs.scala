package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Window-code packing kernels for the exact-substring dedup operator
  * (operators/SuffixSpans).
  *
  * The prefix-doubling suffix ranking pays 3 hash shuffles of the
  * O(corpus characters) position frame PER DOUBLING ROUND — log2(L)
  * rounds for window length L. But a rank only ever feeds EQUALITY
  * tests, so ANY injective encoding of the window's code-point sequence
  * is a valid rank — and when the corpus's code points fit in `bits`
  * bits each, a whole L-window packs EXACTLY into ceil(L·bits/62)
  * int64s (base-2^bits positional encoding, each long holding
  * floor(62/bits) code points, the last block right-anchored at the
  * window end so blocks cover the window at fixed offsets). For the
  * gated geometry (L = 16, ASCII-dominated corpora: bits = 7) that is
  * TWO longs per position computed entirely MAP-SIDE — the ranking
  * loop's 12 shuffles collapse to the single shuffle that counts rank
  * multiplicity. Measured at sf0.1: q273 20.6 s → see
  * OPTIMIZATION_r18.md.
  *
  * Injectivity argument (why spans are bit-identical to the doubling
  * form): within one corpus all packs use the same global `bits` ≥
  * bitlen(max code point), so block value ⟺ its code-point slice
  * (positional base-2^bits numerals with every digit < 2^bits), and the
  * fixed block offsets (0, m, 2m, …, L−m) cover [0, L) — two positions
  * share all block values iff their L-windows are identical code-point
  * sequences, exactly the equivalence the doubled min-pid ranks encode.
  *
  * Positions index CODE POINTS (what Spark's `substring`/`length` count
  * on the JVM path), walked once per document — no per-character string
  * allocation, no split/transform array churn.
  */
object PackExprs {

  /** Code points each long can hold at `bits` bits per code point,
    * keeping packs strictly below 2^62 (positive int64s with headroom).
    */
  def perLong(bits: Int): Int = 62 / bits

  /** Longs per window key. */
  def blocksFor(window: Int, bits: Int): Int = {
    val m = perLong(bits)
    (window + m - 1) / m
  }

  def maxCodePoint(c: Column): Column =
    GraftColumnBridge.column(MaxCodePoint(GraftColumnBridge.expression(c)))

  def packedWindows(c: Column, window: Int, bits: Int): Column =
    GraftColumnBridge.column(
      PackedWindows(GraftColumnBridge.expression(c), window, bits))

  /** Runtime twin: the largest code point in `s` (0 when empty). */
  def maxCodePointJava(s: UTF8String): Int = {
    val str = s.toString
    var mx = 0
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      if (cp > mx) mx = cp
      j += Character.charCount(cp)
    }
    mx
  }

  /** Runtime twin: for every code-point position p (0-based,
    * p ≤ n−window), the window's packed key as an inner array of
    * ceil(window/m) longs (m = floor(62/bits)); block b covers code
    * points [p + off_b, p + off_b + m) with off_b = b·m except the last
    * block, right-anchored at window−m. Packs are built once per block
    * offset with a rolling update (O(n) per block lane), never O(window)
    * per position. Returns an empty array when the string is shorter
    * than `window`. Every code point MUST be < 2^bits — the caller
    * derives `bits` from the corpus maximum.
    */
  def packedWindowsJava(s: UTF8String, window: Int, bits: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < window) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Long](n)
    var i = 0
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      cps(i) = cp.toLong
      i += 1
      j += Character.charCount(cp)
    }
    val m = perLong(bits)
    val mEff = math.min(m, window) // window shorter than one full long
    val nBlk = (window + mEff - 1) / mEff
    // rolling pack of the mEff-code-point block starting at each i:
    // packAt(i+1) = (packAt(i) − cps(i)·B^(mEff−1))·B + cps(i+mEff)
    val nPacks = n - mEff + 1
    val packAt = new Array[Long](nPacks)
    val b = 1L << bits
    var hi = 1L // B^(mEff−1)
    var k = 1
    while (k < mEff) { hi = hi << bits; k += 1 }
    var acc = 0L
    i = 0
    while (i < mEff) { acc = (acc << bits) | cps(i); i += 1 }
    packAt(0) = acc
    i = 1
    while (i < nPacks) {
      acc = ((acc - cps(i - 1) * hi) << bits) | cps(i + mEff - 1)
      packAt(i) = acc
      i += 1
    }
    val nPos = n - window + 1
    val out = new Array[Any](nPos)
    var p = 0
    while (p < nPos) {
      val key = new Array[Long](nBlk)
      var blk = 0
      while (blk < nBlk) {
        val off = if (blk == nBlk - 1) window - mEff else blk * mEff
        key(blk) = packAt(p + off)
        blk += 1
      }
      out(p) = new GenericArrayData(key)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Largest code point of a string (0 for empty) — the one-pass corpus
  * probe that sizes [[PackedWindows]]' pack base.
  */
case class MaxCodePoint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"MaxCodePoint requires a string input, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    PackExprs.maxCodePointJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.PackExprs.maxCodePointJava($s);")

  override protected def withNewChildInternal(newChild: Expression): MaxCodePoint =
    copy(child = newChild)
}

/** Per-position packed window keys (array of array<long>) — see
  * [[PackExprs.packedWindowsJava]] for the exact layout contract.
  */
case class PackedWindows(child: Expression, window: Int, bits: Int)
    extends UnaryExpression {
  require(window >= 1, s"window must be positive, got $window")
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PackedWindows requires a string input, got ${child.dataType}")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PackExprs.packedWindowsJava(input.asInstanceOf[UTF8String], window, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.PackExprs.packedWindowsJava($s, $window, $bits);")

  override protected def withNewChildInternal(newChild: Expression): PackedWindows =
    copy(child = newChild)
}
