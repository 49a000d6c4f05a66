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

  /** `mortonN(qBits, axes)`: d-dimensional Morton interleave — axis j's
    * bit i lands at output position `i*d + j` (axis 0 least significant,
    * the same layout `morton16` gives at d=2). Real lakehouse OPTIMIZE
    * Z-orders 3–4 columns; the 2-D magic-number spread doesn't
    * generalize, so the d-dim kernel is the plain bit loop — `d*qBits`
    * iterations of shift/mask integer ops, still branchless inside
    * whole-stage codegen.
    */
  def mortonN(qBits: Int, cols: Seq[Column]): Column =
    GraftColumnBridge.column(MortonInterleaveN(
      cols.map(GraftColumnBridge.expression), qBits))

  /** The d-dim interleave kernel (called from interpreted eval and
    * generated code). Pure function of the low `qBits` bits of each
    * axis.
    */
  def interleaveN(qBits: Int, xs: Array[Long]): Long = {
    val d = xs.length
    var out = 0L
    var i = 0
    while (i < qBits) {
      var j = 0
      while (j < d) {
        out |= ((xs(j) >>> i) & 1L) << (i * d + j)
        j += 1
      }
      i += 1
    }
    out
  }
}

/** d-ary Morton interleave over `qBits`-bit axes. Requires
  * `d * qBits ≤ 62` so the index stays a positive long.
  */
case class MortonInterleaveN(children: Seq[Expression], qBits: Int)
    extends Expression {

  require(children.size >= 2, "MortonInterleaveN needs at least 2 axes")
  require(children.size * qBits <= 62,
    s"MortonInterleaveN: ${children.size} axes x $qBits bits overflow a long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"MortonInterleaveN requires all-bigint axes, got " +
        children.map(_.dataType).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderExprs.interleaveN(qBits, xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    NaryCurveCodegen.gen(ctx, ev, children, nullable,
      arr => s"graft.plans.ZOrderExprs.interleaveN($qBits, new long[]{$arr})")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MortonInterleaveN =
    copy(children = newChildren)
}

/** Shared codegen for the N-ary long→long curve kernels: evaluate every
  * axis, OR the null flags, call one static helper on a stack array.
  */
private[plans] object NaryCurveCodegen {
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral

  def gen(ctx: CodegenContext, ev: ExprCode, children: Seq[Expression],
          nullable: Boolean, call: String => String): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code.toString).mkString("\n")
    val invoke = call(evals.map(_.value).mkString(", "))
    if (nullable) {
      val nullCheck = evals.map(_.isNull.toString).mkString(" || ")
      ev.copy(code =
        code"""
          $childCode
          boolean ${ev.isNull} = $nullCheck;
          long ${ev.value} = ${ev.isNull} ? 0L : $invoke;""")
    } else {
      ev.copy(isNull = FalseLiteral, code =
        code"""
          $childCode
          long ${ev.value} = $invoke;""")
    }
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

  /** d-dimensional Hilbert index — the classic xy2d walk is 2-D-only,
    * so the d-dim kernel is Skilling's transpose algorithm ("Programming
    * the Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard
    * public formulation): per-axis inverse-undo rounds from the top bit
    * down, a Gray encode across axes, then bit-interleave of the
    * transposed axes (axis 0 most significant per bit level). Every
    * step is shift/mask/xor integer ops — one static call inside
    * whole-stage codegen, reproduced round-for-round by the DuckDB
    * oracle's unrolled CTEs. NOTE: at d=2 this parameterization is a
    * valid Hilbert curve but NOT bit-identical to `hilbertJava`'s xy2d
    * orientation; the 2-D operators keep xy2d for oracle stability.
    */
  def hilbertN(qBits: Int, cols: Seq[Column]): Column =
    GraftColumnBridge.column(HilbertIndexN(
      cols.map(GraftColumnBridge.expression), qBits))

  /** Skilling transpose walk + interleave. MUTATES `xs` (callers pass a
    * fresh array). Called from interpreted eval and generated code.
    */
  def hilbertNJava(qBits: Int, xs: Array[Long]): Long = {
    val n = xs.length
    val m = 1L << (qBits - 1)
    // inverse undo: from the top bit level down, reflect/exchange each
    // axis against axis 0 inside the level's subcube
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across axes
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((xs(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // interleave the transposed axes: per bit level (MSB first), axis 0
    // contributes the most significant of the level's n bits
    var d = 0L
    var k = qBits - 1
    while (k >= 0) {
      var j = 0
      while (j < n) { d = (d << 1) | ((xs(j) >>> k) & 1L); j += 1 }
      k -= 1
    }
    d
  }

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

/** d-ary Hilbert index over `qBits`-bit axes (Skilling transpose walk).
  * Requires `d * qBits ≤ 62` so the index stays a positive long.
  */
case class HilbertIndexN(children: Seq[Expression], qBits: Int)
    extends Expression {

  require(children.size >= 2, "HilbertIndexN needs at least 2 axes")
  require(children.size * qBits <= 62,
    s"HilbertIndexN: ${children.size} axes x $qBits bits overflow a long")
  require(qBits >= 1, s"hilbert qBits out of range: $qBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"HilbertIndexN requires all-bigint axes, got " +
        children.map(_.dataType).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertExprs.hilbertNJava(qBits, xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    NaryCurveCodegen.gen(ctx, ev, children, nullable,
      arr => s"graft.plans.HilbertExprs.hilbertNJava($qBits, new long[]{$arr})")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)
}
