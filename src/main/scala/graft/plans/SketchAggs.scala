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

  /** KMV distinct estimate of a long key column — the q38 estimator as a
    * native aggregate. Unlike Misra–Gries, the k-min-distinct-hash state
    * is a pure SET function of the input (insertion order cannot change
    * which k hashes are smallest), so the estimate is bit-deterministic
    * across partitionings and oracle-verifiable per group. Null when the
    * group has fewer than k distinct hashes — in that regime an exact
    * count is cheaper than any sketch (the groupedKmvDistinct contract).
    */
  def kmvEstimateAgg(key: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvEstimateAgg(GraftColumnBridge.expression(key), k)
        .toAggregateExpression())

  /** Count-min-sketch counters of a fingerprint column as a single
    * aggregate: the depth×width integer grid rides partial aggregation
    * (one long[] buffer per partition, vector-add merge — the additive
    * algebra, fourth member of the native sketch family next to HLL's
    * max, KMV's k-min and MG's counters). Returns the NON-ZERO cells as
    * (d, bucket, cnt) structs — exactly the `Sketches.cmsCounters` frame
    * — so `cmsEstimates` consumes either form interchangeably. Fully
    * deterministic (integer adds are order-free).
    */
  def cmsCountersAgg(keyFp: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CmsCountersAgg(GraftColumnBridge.expression(keyFp), depth, width)
        .toAggregateExpression())

  /** Misra–Gries top-k candidate summary of a long key column: an array
    * of (item, lower) counters, at most k entries. The summary SET is
    * partition-order dependent (inherent to MG), but its GUARANTEE is
    * not: every item with true frequency > N/(k+1) is present in the
    * merged summary (Agarwal et al., mergeable summaries) — so the
    * deterministic consumption pattern is candidates → exact-count join
    * → threshold filter, which q190 gates. State is O(k) per group
    * through partial aggregation, vs the full key-cardinality hash-agg
    * an exact GROUP BY needs on the raw stream.
    */
  def misraGriesTopK(key: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesTopK(GraftColumnBridge.expression(key), k)
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
      // identical to Sketches.hllHash(keyHash(k)): affine then cube mod P.
      // floorMod, not %: `%` keeps the dividend's sign, so a negative key
      // (or one past ~2^63/HA, where HA·k wraps) yields a negative h and
      // buffer(h % m) is an AIOOBE that kills the whole query — graft_hll
      // is a public SQL aggregate over ANY integral column, so the hash
      // must be total. floorMod ≡ % on the non-negative non-wrapping
      // domain (bit-identity with the oracle-gated arithmetic preserved),
      // and maps the rest of the long domain into [0, P) deterministically.
      val h0 = java.lang.Math.floorMod(Sketches.HA * k + Sketches.HB, Sketches.P)
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

/** KMV buffer: the k smallest DISTINCT hashes as a sorted set. Merge is
  * set union re-truncated to k minima — associative, commutative,
  * insertion-order free, so unlike MG this aggregate is value-
  * deterministic under any partitioning.
  */
case class KmvEstimateAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"KMV needs k > 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires an integral key, got $other")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      // ≡ Sketches.keyHash: (HA·key + HB) mod P — floorMod so negative /
      // wrapping keys hash into [0, P) instead of poisoning the k-min
      // order statistic with negative "hashes" (same totality rule as
      // HllEstimateAgg; bit-identical on the non-negative domain)
      insert(buf, java.lang.Math.floorMod(Sketches.HA * key + Sketches.HB,
        Sketches.P))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next().longValue())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) null
    else {
      // ≡ Sketches.kmvDistinctEstimate: (k−1) / (kth / P)
      val kth = buf.last().longValue()
      (k - 1).toDouble / (kth.toDouble / Sketches.P.toDouble)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val out = new java.util.TreeSet[java.lang.Long]()
    while (bb.remaining() >= 8) out.add(bb.getLong())
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvEstimateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvEstimateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvEstimateAgg =
    copy(child = newChild)

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv"
}

/** Misra–Gries counters: at most k (item → lower-bound count) entries.
  * update is the classic decrement-all step; merge adds counters then
  * subtracts the (k+1)-th largest count from every entry and drops the
  * non-positive (the mergeable-summaries reduction, which preserves the
  * frequency > N/(k+1) presence guarantee).
  */
case class MisraGriesTopK(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"Misra-Gries needs k > 0, got $k")

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg requires an integral key, got $other")
  }

  override def createAggregationBuffer(): Buf = new Buf()

  private def add(buf: Buf, item: Long, cnt: Long): Unit = {
    val cur = buf.get(item)
    if (cur != null) { buf.put(item, cur + cnt); () }
    else if (buf.size < k) { buf.put(item, cnt); () }
    else {
      // decrement-all by the capped amount; drop exhausted counters
      val it = buf.entrySet().iterator()
      var minV = Long.MaxValue
      while (it.hasNext) { val v = it.next().getValue.longValue(); if (v < minV) minV = v }
      val dec = math.min(cnt, minV)
      val it2 = buf.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue.longValue() - dec
        if (nv <= 0) it2.remove() else e.setValue(nv)
      }
      if (cnt - dec > 0) add(buf, item, cnt - dec)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      add(buf, key, 1L)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue
        else java.lang.Long.valueOf(cur.longValue() + e.getValue.longValue()))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next().longValue(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1)
      val it2 = buf.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue.longValue() - cut
        if (nv <= 0) it2.remove() else e.setValue(nv)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    // sorted by item id so the ARRAY form is canonical for a given
    // counter map (the map itself is partition-order dependent — see
    // the object doc for the deterministic consumption pattern)
    val items = new Array[Long](buf.size)
    var i = 0
    val ks = buf.keySet().iterator()
    while (ks.hasNext) { items(i) = ks.next().longValue(); i += 1 }
    java.util.Arrays.sort(items)
    val rows: Array[Any] = items.map(item =>
      InternalRow(item, buf.get(item).longValue()): Any)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val out = new Buf()
    while (bb.remaining() >= 16) out.put(bb.getLong(), bb.getLong())
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("lower", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_mg"
}

/** CMS buffer: dense Array[Long] of depth·width cells; merge is a
  * vector add. Bucket arithmetic ≡ Sketches.cmsBucket on the shared
  * affine row hashes (`Lsh.A(d)`, `Lsh.B(d)` mod P mod width).
  */
case class CmsCountersAgg(child: Expression, depth: Int, width: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, s"CMS needs positive depth/width: $depth x $width")
  require(depth <= graft.functions.Lsh.A.length,
    s"CMS depth $depth exceeds the shared hash family")

  private val as = (0 until depth).map(graft.functions.Lsh.A).toArray
  private val bs = (0 until depth).map(graft.functions.Lsh.B).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires an integral fingerprint, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val fp = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      var d = 0
      while (d < depth) {
        // floorMod: graft_cms accepts ANY integral fingerprint column, so
        // a negative fp (out of polyFingerprint's [0,P) range) must land
        // in a real bucket, not index buffer(-n) and crash the query.
        // Identical to % on the documented [0, P) domain.
        val bucket = (java.lang.Math.floorMod(as(d) * fp + bs(d),
          Sketches.P) % width).toInt
        buffer(d * width + bucket) += 1
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val rows = scala.collection.mutable.ArrayBuffer[Any]()
    var d = 0
    while (d < depth) {
      var b = 0
      while (b < width) {
        val c = buffer(d * width + b)
        if (c != 0L) rows += InternalRow(d, b.toLong, c)
        b += 1
      }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val out = new Array[Long](storage.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCountersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCountersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsCountersAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cms"
}
