package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot numeric kernels.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * `CodegenFallback` — every element evaluation walks the interpreted
  * expression tree, which turns a 64-float dot product into ~200 virtual
  * calls. These expressions generate a tight primitive loop instead, and
  * keep the surrounding projection inside whole-stage codegen.
  *
  * Numerical contract: both kernels fold strictly left-to-right in double
  * (VecDot) / i64 (PolyFingerprint), bit-identical to the HOF formulations
  * they replace and to the DuckDB oracle's `list_reduce`.
  */
object VectorExprs {

  /** `dot(a, b)`: Σ a[i]*b[i] accumulated sequentially in double. Accepts
    * float or double arrays on either side (mixed is fine — float elements
    * are widened exactly).
    */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Rolling polynomial hash of a string's bytes:
    * `acc = (acc*31 + byte) mod 1e9+7` — byte-level twin of
    * TextAnalysis.rollingFingerprint (identical on ASCII corpora, where
    * `ascii(char) == byte`).
    */
  def polyFingerprint(s: Column): Column =
    GraftColumnBridge.column(PolyFingerprint(GraftColumnBridge.expression(s)))

  /** `argminL2(v, cb)`: over the codes packed code-major in the flat
    * array `cb` (|cb| = codes × |v|), the struct(code, dist2) of the
    * nearest code by squared L2 — sequential left-assoc fold per code
    * (≡ the oracle's list_reduce from 0.0), ties to the LOWEST code
    * (≡ row_number ORDER BY d2, code). One row per subvector instead
    * of one per (subvector, code): the join-blowup form this replaces
    * materialized 33M interpreted-lambda rows per PQ training pass at
    * the q271 sf0.1 geometry.
    */
  def argminL2(v: Column, cb: Column): Column =
    GraftColumnBridge.column(VecArgminL2(GraftColumnBridge.expression(v), GraftColumnBridge.expression(cb)))

  /** `l2dist2(a, b)`: Σ (a[i]−b[i])² accumulated sequentially in double
    * — the codegen twin of `aggregate(zip_with(a, b, (x,c) -> (x-c)*
    * (x-c)), 0.0D, (s,t) -> s+t)` (identical fold order, so
    * bit-identical results); the HOF form runs interpreted per element
    * and dominates exact-ground-truth scans.
    */
  def l2dist2(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecL2(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"VecDot requires float/double arrays, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

case class PolyFingerprint(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PolyFingerprint requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + bytes(i)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        byte[] $bytes = $s.getBytes();
        long $acc = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $acc = ($acc * 31 + $bytes[$i]) % 1000000007L;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

/** Squared L2 distance of two double arrays (see
  * [[VectorExprs.l2dist2]]).
  */
case class VecL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"VecL2 requires double arrays, got ${left.dataType} and ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val t = x.getDouble(i) - y.getDouble(i)
      acc += t * t
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $t = $a.getDouble($i) - $b.getDouble($i);
          $acc += $t * $t;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecL2 =
    copy(left = newLeft, right = newRight)
}

/** Nearest code by squared L2 over a code-major flat codebook (see
  * [[VectorExprs.argminL2]]). Both inputs must be double arrays; the
  * codebook length must be a positive multiple of the vector length.
  */
case class VecArgminL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"VecArgminL2 requires double arrays, got ${left.dataType} and ${right.dataType}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("code", IntegerType, nullable = false),
    StructField("dist2", DoubleType, nullable = false)))

  override protected def nullSafeEval(v: Any, cb: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val b = cb.asInstanceOf[ArrayData]
    val k = a.numElements()
    require(k > 0 && b.numElements() % k == 0,
      s"codebook length ${b.numElements()} is not a multiple of vector length $k")
    val n = b.numElements() / k
    var best = 0
    var bestD = Double.NaN
    var c = 0
    while (c < n) {
      var d = 0.0
      var i = 0
      while (i < k) {
        val t = a.getDouble(i) - b.getDouble(c * k + i)
        d += t * t
        i += 1
      }
      // strictly-less keeps the earlier (lowest) code on ties — the
      // oracle's row_number ORDER BY d2, code
      if (c == 0 || d < bestD) { bestD = d; best = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        int $k = $a.numElements();
        int $n = $b.numElements() / $k;
        int $best = 0;
        double $bestD = 0.0;
        for (int $c = 0; $c < $n; $c++) {
          double $d = 0.0;
          for (int $i = 0; $i < $k; $i++) {
            double $t = $a.getDouble($i) - $b.getDouble($c * $k + $i);
            $d += $t * $t;
          }
          if ($c == 0 || $d < $bestD) { $bestD = $d; $best = $c; }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{java.lang.Integer.valueOf($best), java.lang.Double.valueOf($bestD)});
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecArgminL2 =
    copy(left = newLeft, right = newRight)
}
