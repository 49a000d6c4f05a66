package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave kernel for multi-dimensional data layout.
  *
  * At 100 TB the dominant cost of most scans is the bytes NOT skipped:
  * min/max zone maps only prune files when rows that are close in the
  * filter dimensions are close in file order. A Z-order curve gives that
  * locality for two dimensions at once — interleaving the bits of the two
  * (quantized) dimension values produces a single sort key whose
  * contiguous ranges are small rectangles in (x, y) space, so range-
  * partitioning by the Morton code yields files with tight min/max on
  * BOTH columns (the layout Delta/Iceberg `ZORDER BY` computes).
  *
  * The interleave itself is four shift-mask rounds per dimension (the
  * classic "magic numbers" bit spread) — pure integer ops, so the kernel
  * stays inside whole-stage codegen and is reproduced exactly by the
  * DuckDB oracle with the same arithmetic.
  */
object ZOrderExprs {

  /** `morton16(x, y)`: interleave the low 16 bits of `x` (even bit
    * positions) and `y` (odd bit positions) into one 32-bit Z-value.
    */
  def morton16(x: Column, y: Column): Column =
    GraftColumnBridge.column(MortonInterleave16(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))

  /** Bit-spread of the low 16 bits of `v` into even positions 0,2,…,30. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}

/** `spread16(x) | (spread16(y) << 1)` over the low 16 bits of two longs. */
case class MortonInterleave16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"MortonInterleave16 requires (bigint, bigint), got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExprs.spread16(a.asInstanceOf[Long]) |
      (ZOrderExprs.spread16(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spread = ctx.addNewFunction("graftSpread16",
      s"""
         |private long graftSpread16(long v) {
         |  long x = v & 0xFFFFL;
         |  x = (x | (x << 8)) & 0x00FF00FFL;
         |  x = (x | (x << 4)) & 0x0F0F0F0FL;
         |  x = (x | (x << 2)) & 0x33333333L;
         |  x = (x | (x << 1)) & 0x55555555L;
         |  return x;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $spread($a) | ($spread($b) << 1);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MortonInterleave16 =
    copy(left = newLeft, right = newRight)
}

/** Hilbert-curve index kernel — the locality upgrade over Morton.
  *
  * The Z-curve takes a long diagonal jump every time a high bit flips
  * (cells 0b0111… and 0b1000… are grid-adjacent in index space but far
  * apart spatially), so some Z-blocks are NOT tight rectangles. The
  * Hilbert curve visits every cell with unit steps — adjacent index
  * ranges are always spatially compact — which makes per-block min/max
  * bounds uniformly tight and is why layout engines offer it next to
  * ZORDER. The index is the classic xy2d walk (public domain): per bit
  * level s = n/2 … 1, quadrant digit d += s²·((3·rx) XOR ry), then the
  * reflect/transpose rotation — a fixed `qBits`-round integer loop, one
  * static Java call inside whole-stage codegen, reproduced round-for-
  * round by the DuckDB oracle's unrolled CTEs.
  */
object HilbertExprs {

  def hilbert(x: Column, y: Column, qBits: Int): Column =
    GraftColumnBridge.column(HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), qBits))

  /** xy→d on the 2^qBits × 2^qBits grid. Called from interpreted eval
    * and generated code.
    */
  def hilbertJava(qBits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (qBits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

case class HilbertIndex(left: Expression, right: Expression, qBits: Int)
    extends BinaryExpression {

  require(qBits >= 1 && qBits <= 31, s"hilbert qBits out of range: $qBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HilbertIndex requires (bigint, bigint), got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertExprs.hilbertJava(qBits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HilbertExprs.hilbertJava($qBits, $a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
