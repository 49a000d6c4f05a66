package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import graft.functions.Sketches

/** Native mergeable-sketch AGGREGATE functions — the partial-aggregation
  * form of the `Sketches` register frames.
  *
  * Why an aggregate expression and not the register-frame composition
  * (q121/q122): the frame form materializes a (group × m) register GRID
  * through a shuffle before estimating — the right shape when the
  * registers themselves are the product (commits, streaming segment
  * merges, cross-day folds). But when only the ESTIMATE is wanted inside
  * a wider aggregation, a native `TypedImperativeAggregate` carries the
  * m-byte register buffer THROUGH Spark's partial-aggregation machinery:
  * map-side partials absorb every row locally, the shuffle moves one
  * m-byte buffer per (partition × group) instead of per-register rows,
  * and the operator composes with arbitrary other aggregates in the same
  * `agg(...)` — one scan, one shuffle, O(m) state per group. This is the
  * one aggregation shape the DataFrame-composed form cannot express.
  *
  * Arithmetic is IDENTICAL to `Sketches.hllRegisters`/`hllEstimate`
  * (affine hash → cube mod P → low-bits index / leading-zero rho; raw
  * estimator α·m²/Σ2^−rho with every term an exact power of two), so the
  * estimate is bit-identical to the oracle-gated q121 formulation and
  * DuckDB reproduces it exactly — an oracle-verifiable native aggregate.
  */
object SketchAggs {

  /** HLL distinct estimate of a long key column as a single aggregate
    * expression (usable inside any groupBy().agg(...)).
    */
  def hllEstimateAgg(key: Column, m: Int): Column =
    GraftColumnBridge.column(
      HllEstimateAgg(GraftColumnBridge.expression(key), m)
        .toAggregateExpression())
}

/** The HLL register buffer is a dense Array[Byte] of length m (rho ≤
  * restBits+1 ≤ 31 for any power-of-two m under P ≈ 2^30, so a byte per
  * register); merge is elementwise max (idempotent, order-free);
  * serialize is the buffer itself.
  */
case class HllEstimateAgg(child: Expression, m: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(m > 1 && (m & (m - 1)) == 0,
    s"HLL register count must be a power of two, got $m")

  private val p = java.lang.Integer.numberOfTrailingZeros(m)
  private val w = Sketches.hllRestBits(m)
  private val numerator = Sketches.hllNumerator(m)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll requires an integral key, got $other")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      // identical to Sketches.hllHash(keyHash(k)): affine then cube mod P
      val h0 = (Sketches.HA * k + Sketches.HB) % Sketches.P
      val h = ((h0 * h0) % Sketches.P * h0) % Sketches.P
      val idx = (h % m).toInt
      val rest = h >> p
      // rho ≡ the hllRho CASE cascade: smallest r with rest ≥ 2^(w−r),
      // i.e. w − bitLength(rest) + 1; zero rest → w + 1
      val rho =
        if (rest == 0L) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rho > buffer(idx)) buffer(idx) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    // Σ2^−rho: every term is an exact power of two ≥ 2^−(w+1), so the
    // double sum is exact and order-independent — same value the q121
    // register-frame sum produces
    var z = 0.0
    var i = 0
    while (i < m) {
      z += 1.0 / java.lang.Math.scalb(1.0, buffer(i))
      i += 1
    }
    numerator / z
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(storage: Array[Byte]): Array[Byte] = storage.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllEstimateAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllEstimateAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllEstimateAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll"
}
