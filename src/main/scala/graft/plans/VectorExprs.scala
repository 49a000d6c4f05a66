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
