package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native grouped TOP-K as a `TypedImperativeAggregate` — the
  * partial-aggregation answer to the window-ranking idiom (q11's
  * `row_number().over(partitionBy(g).orderBy(v.desc))` + `rank <= k`).
  *
  * Why an aggregate and not the window: the window form SORTS every
  * group's full row set inside one shuffle partition to keep k rows per
  * group — at 100 TB that is a sort of the whole fact aggregate just to
  * discard all but k·|groups| rows. The heap aggregate carries a bounded
  * k-entry buffer THROUGH partial aggregation: map-side partials absorb
  * rows locally (O(log k) per row against the current k-floor), the
  * shuffle moves at most k entries per (partition × group), and no sort
  * of the full set ever happens. Same output, sort replaced by a
  * bounded merge — the fifth member of the native bounded-state
  * aggregate family (HLL max / KMV k-min / MG counters / CMS add /
  * TOP-K order-statistic).
  *
  * Determinism: the kept set is the k GREATEST (value, key) pairs under
  * the total order (value DESC, key ASC) — an order statistic of the
  * input SET, so like KMV (and unlike Misra–Gries) the result is
  * bit-identical under any partitioning or merge order, which is what
  * makes it oracle-verifiable against the window form. Duplicate
  * (value, key) pairs collapse (set semantics) — callers feed one row
  * per key (the grouped-aggregate shape), where the distinction cannot
  * arise.
  */
object TopKAgg {

  /** Top `k` (value, key) pairs per group, value DESC then key ASC, as
    * an array of structs in rank order. Both columns integral.
    */
  def topKPairs(value: Column, key: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKPairsAgg(GraftColumnBridge.expression(value),
        GraftColumnBridge.expression(key), k)
        .toAggregateExpression())
}

case class TopKPairsAgg(left: Expression, right: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]]
  with BinaryLike[Expression] {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  // best-first total order: value DESC, then key ASC; 0 only on a fully
  // identical pair (set semantics — see scaladoc)
  private object Ord extends java.util.Comparator[Array[Long]]
    with Serializable {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val byV = java.lang.Long.compare(b(0), a(0))
      if (byV != 0) byV else java.lang.Long.compare(a(1), b(1))
    }
  }

  private def integral(dt: DataType) =
    dt == LongType || dt == IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires integral (value, key), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](Ord)

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long    => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }

  private def insert(buf: java.util.TreeSet[Array[Long]],
                     e: Array[Long]): Unit = {
    if (buf.size < k) { buf.add(e); () }
    else if (Ord.compare(e, buf.last()) < 0) {
      // strictly better than the current k-th: admit, evict the worst
      if (buf.add(e)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[Array[Long]],
                      input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val v = left.eval(input)
    val key = right.eval(input)
    if (v != null && key != null) insert(buf, Array(asLong(v), asLong(key)))
    buf
  }

  override def merge(buf: java.util.TreeSet[Array[Long]],
                     other: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val rows = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); rows(i) = InternalRow(e(0), e(1)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e(0)); bb.putLong(e(1)) }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val out = new java.util.TreeSet[Array[Long]](Ord)
    while (bb.remaining() >= 16) out.add(Array(bb.getLong(), bb.getLong()))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("key", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"
}
