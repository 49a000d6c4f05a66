package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-signature kernels for the LSH operators.
  *
  * Why whole-signature expressions and not composed HOFs: Catalyst's
  * CollapseProject inlines an upstream projection referenced once
  * syntactically — but an expression inlined UNDER a higher-order function
  * is re-evaluated per outer element at runtime, so a staged
  * `shingles → fingerprints → K-position signature` pipeline silently
  * becomes K re-evaluations of the whole fingerprint fold per row
  * (measured: 25x slowdown). A single expression computes the signature in
  * one pass per row and generates tight primitive loops.
  *
  * Arithmetic is identical to the HOF/oracle formulation: per-element
  * polynomial byte fold, affine permutations mod P (MinHash), 32-bit mix +
  * per-bit tie-wins majority (SimHash).
  */
object SignatureExprs {

  /** MinHash signature of an array<string> shingle set (array<long> of
    * `a.length` positions). Null/empty input → null.
    */
  def minHashSig(shingles: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(shingles), a, b, p))

  /** SimHash fingerprint of an array<string> shingle set. */
  def simHash(shingles: Column, ga: Long, gb: Long, mod: Long, bits: Int): Column =
    GraftColumnBridge.column(
      SimHash(GraftColumnBridge.expression(shingles), ga, gb, mod, bits))

  /** Word-array SimHash: one 32-bit majority word per (ga,gb) mixing pair,
    * so fingerprints of any 32·n width stay exact in both engines.
    */
  def simHashWords(shingles: Column, gas: Seq[Long], gbs: Seq[Long], mod: Long): Column =
    GraftColumnBridge.column(
      SimHashWords(GraftColumnBridge.expression(shingles), gas, gbs, mod))

  /** Distinct space-joined word n-grams of an array<string> of words
    * (first-occurrence order, ≡ `list_distinct` of the composed n-grams).
    */
  def distinctNGrams(words: Column, n: Int): Column =
    GraftColumnBridge.column(DistinctNGrams(GraftColumnBridge.expression(words), n))
}

private[plans] trait ShingleArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.getClass.getSimpleName} requires array<string>, got $other")
  }

  /** The shared byte-fold fingerprint (≡ PolyFingerprint). */
  protected final def fp(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + bytes(i)) % 1000000007L; i += 1 }
    acc
  }

  /** Codegen helper: the fingerprint fold as a Java snippet. */
  protected final def fpCode(bytesVar: String, accVar: String, iVar: String): String =
    s"""
      long $accVar = 0L;
      for (int $iVar = 0; $iVar < $bytesVar.length; $iVar++) {
        $accVar = ($accVar * 31 + $bytesVar[$iVar]) % 1000000007L;
      }
    """
}

case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ShingleArrayInput {

  private val k = a.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val f = fp(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val h = (a(j) * f + b(j)) % p
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val bi = ctx.freshName("bi")
      val h = ctx.freshName("h")
      s"""
        int $n = $c.numElements();
        long[] $sig = new long[$k];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        for (int $i = 0; $i < $n; $i++) {
          byte[] $bytes = $c.getUTF8String($i).getBytes();
          ${fpCode(bytes, acc, bi)}
          for (int $j = 0; $j < $k; $j++) {
            long $h = ($aRef[$j] * $acc + $bRef[$j]) % ${p}L;
            if ($h < $sig[$j]) $sig[$j] = $h;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class SimHash(child: Expression, ga: Long, gb: Long, mod: Long, bits: Int)
    extends UnaryExpression with ShingleArrayInput {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val g = (ga * fp(arr.getUTF8String(i).getBytes) + gb) % mod
      var j = 0
      while (j < bits) { cnt(j) += ((g >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) { if (2 * cnt(j) >= n) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val bi = ctx.freshName("bi")
      val g = ctx.freshName("g")
      val sim = ctx.freshName("sim")
      s"""
        int $n = $c.numElements();
        int[] $cnt = new int[$bits];
        for (int $i = 0; $i < $n; $i++) {
          byte[] $bytes = $c.getUTF8String($i).getBytes();
          ${fpCode(bytes, acc, bi)}
          long $g = (${ga}L * $acc + ${gb}L) % ${mod}L;
          for (int $j = 0; $j < $bits; $j++) { $cnt[$j] += (int)(($g >>> $j) & 1L); }
        }
        long $sim = 0L;
        for (int $j = 0; $j < $bits; $j++) {
          if (2 * $cnt[$j] >= $n) $sim |= (1L << $j);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Word-array SimHash (geometry-parameterized widths): word w is the 32-bit
  * tie-wins-majority fingerprint under the mix `(gas(w)*fp + gbs(w)) % mod`.
  * One fingerprint fold per shingle feeds every word — same single-pass
  * shape as the scalar kernel.
  */
case class SimHashWords(child: Expression, gas: Seq[Long], gbs: Seq[Long], mod: Long)
    extends UnaryExpression with ShingleArrayInput {

  private val words = gas.length
  require(words > 0 && gbs.length == words, "one (ga,gb) pair per 32-bit word")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](words * 32)
    var i = 0
    while (i < n) {
      val f = fp(arr.getUTF8String(i).getBytes)
      var w = 0
      while (w < words) {
        val g = (gas(w) * f + gbs(w)) % mod
        var j = 0
        while (j < 32) { cnt(w * 32 + j) += ((g >>> j) & 1L).toInt; j += 1 }
        w += 1
      }
      i += 1
    }
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var sim = 0L
      var j = 0
      while (j < 32) { if (2 * cnt(w * 32 + j) >= n) sim |= (1L << j); j += 1 }
      out(w) = sim
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gaRef = ctx.addReferenceObj("shwGa", gas.toArray, "long[]")
    val gbRef = ctx.addReferenceObj("shwGb", gbs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val bi = ctx.freshName("bi")
      val g = ctx.freshName("g")
      val out = ctx.freshName("out")
      val sim = ctx.freshName("sim")
      s"""
        int $n = $c.numElements();
        int[] $cnt = new int[${words * 32}];
        for (int $i = 0; $i < $n; $i++) {
          byte[] $bytes = $c.getUTF8String($i).getBytes();
          ${fpCode(bytes, acc, bi)}
          for (int $w = 0; $w < $words; $w++) {
            long $g = ($gaRef[$w] * $acc + $gbRef[$w]) % ${mod}L;
            for (int $j = 0; $j < 32; $j++) {
              $cnt[$w * 32 + $j] += (int)(($g >>> $j) & 1L);
            }
          }
        }
        long[] $out = new long[$words];
        for (int $w = 0; $w < $words; $w++) {
          long $sim = 0L;
          for (int $j = 0; $j < 32; $j++) {
            if (2 * $cnt[$w * 32 + $j] >= $n) $sim |= (1L << $j);
          }
          $out[$w] = $sim;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashWords =
    copy(child = newChild)
}

/** Distinct n-gram shingles in one pass (a HOF `transform` + codegen-less
  * `array_distinct` costs ~n² interpreted string comparisons per row).
  * Codegen emits a single callback into `evalArray` — one virtual call per
  * row, with the loop itself in compiled Scala.
  */
case class DistinctNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"DistinctNGrams requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def evalArray(input: ArrayData): ArrayData = {
    val m = input.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = input.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def nullSafeEval(input: Any): Any =
    evalArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dng", this, classOf[DistinctNGrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.evalArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctNGrams =
    copy(child = newChild)
}
