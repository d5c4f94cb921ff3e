package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst
  * aggregate — the theta-sketch primitive for set cardinality AND set
  * algebra (union/intersection estimates across groups) that Spark's
  * built-in `approx_count_distinct` (HLL) cannot do: HLL unions but
  * never intersects.
  *
  * State: the k smallest distinct 64-bit value hashes, O(k) longs per
  * partial aggregate through the shuffle regardless of input size.
  * The retained set is a pure function of the input VALUE SET (k
  * smallest of a set does not depend on arrival order), so the
  * aggregate is bit-identical under any partition layout.
  *
  * Exact regime (the Misra-Gries oracle device): while fewer than k
  * distinct hashes were seen the sketch IS the full hash set and
  * every estimate is the exact distinct count — which is what makes
  * the operator oracle-verifiable against plain SQL `COUNT(DISTINCT)`
  * at test scale while remaining the bounded sketch you'd run at
  * 100 TB. Above k, standard KMV: est = (k−1)/u_k with relative
  * error ~1/√k. Hashes are stored sign-flipped (h ^ Long.MinValue)
  * so signed ordering equals unsigned hash ordering.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"k must be > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    KmvSketchAgg.add(buf, KmvSketchAgg.hashAny(v), k)
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) KmvSketchAgg.add(a, it.next().longValue(), k)
    a
  }

  /** Ascending (sign-flipped) retained hashes. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream((buf.size + 1) * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(java.lang.Long.valueOf(in.readLong())); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
}

object KmvSketchAgg {
  /** `kmv_sketch(col, k)` aggregate Column → `array<long>`. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Insert a (sign-flipped) hash, keeping the k smallest distinct. */
  private[graft] def add(buf: java.util.TreeSet[java.lang.Long], h: Long,
                         k: Int): Unit = {
    if (buf.size < k) { buf.add(java.lang.Long.valueOf(h)); () }
    else if (h < buf.last().longValue()) {
      if (buf.add(java.lang.Long.valueOf(h)) && buf.size > k) {
        buf.pollLast(); ()
      }
    }
  }

  private def mix(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic 64-bit hash of a value, sign-flipped so signed
    * ordering equals unsigned hash ordering (splitmix64 finalizer;
    * strings fold FNV-1a first). Internal only — no oracle ever sees
    * a hash; estimates leave the exact regime before hashes matter.
    */
  private[graft] def hashAny(v: Any): Long = {
    val h = v match {
      case l: Long    => mix(l)
      case i: Int     => mix(i.toLong)
      case s: Short   => mix(s.toLong)
      case b: Byte    => mix(b.toLong)
      case u: UTF8String =>
        val bytes = u.getBytes
        var acc = 0xCBF29CE484222325L
        var i = 0
        while (i < bytes.length) {
          acc = (acc ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
          i += 1
        }
        mix(acc)
      case other =>
        throw new IllegalArgumentException(
          s"kmv_sketch: unsupported value type ${other.getClass}")
    }
    h ^ java.lang.Long.MIN_VALUE
  }
}

/** `kmv_merge(sketchArray, k)` — merge PRE-BUILT KMV sketches (the
  * `array<long>` a [[KmvSketchAgg]] emitted) instead of raw values:
  * the read half of the persisted distinct-count store. The merge of
  * k-smallest sets is itself a k-smallest set, so partials combine
  * associatively map-side and the result stays a pure function of the
  * underlying value set — byte-identical under any layout, replay, or
  * merge order (no canonicalization step needed, unlike the KLL fold).
  *
  * `emitSketch = true` → the merged `array<long>` (the store's
  * compaction fold); otherwise `struct(n_distinct, is_exact)` — exact
  * count below k retained hashes, the standard (k−1)/u_k estimate
  * above.
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    emitSketch: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"k must be > 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitSketch) ArrayType(LongType, containsNull = false)
    else StructType(Seq(
      StructField("n_distinct", LongType, nullable = false),
      StructField("is_exact", BooleanType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      KmvSketchAgg.add(buf, arr.getLong(i), k); i += 1
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) KmvSketchAgg.add(a, it.next().longValue(), k)
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    if (emitSketch) {
      val out = new Array[Long](buf.size)
      var i = 0
      val it = buf.iterator()
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    } else if (buf.size < k) {
      InternalRow(buf.size.toLong, true)
    } else {
      // (k−1)/u_k with u_k = the unsigned fraction of the k-th hash
      val frac = (buf.last().longValue().toDouble -
        java.lang.Long.MIN_VALUE.toDouble) / 1.8446744073709552E19
      InternalRow(Math.round((k - 1).toDouble / frac), false)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream((buf.size + 1) * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(java.lang.Long.valueOf(in.readLong())); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = c.head)
}

object KmvMergeAgg {
  /** `struct(n_distinct, is_exact)` from merged sketch rows. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Merged sketch `array<long>` (the compaction fold). */
  def sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(c), k, emitSketch = true)
        .toAggregateExpression())
}
