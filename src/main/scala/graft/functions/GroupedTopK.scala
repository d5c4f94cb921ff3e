package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Grouped top-k as a custom Catalyst aggregate: the k smallest
  * (sortKey, payload) long pairs per group — `TakeOrderedAndProject`'s
  * per-task-heap shape, but PER GROUP.
  *
  * Why not `row_number() OVER (PARTITION BY stratum ORDER BY ...)`:
  * a window sends every row of a stratum to ONE task. With a handful
  * of corpus-sized strata (the language/domain case) that is a
  * single-task sort of ~the whole corpus — the partition-skew killer
  * PlanQualitySpec hunts. This aggregate keeps O(k) state per partial,
  * merges associatively, and moves only k pairs per partition through
  * the shuffle; the result set (the k smallest of a SET) is
  * arrival-order-independent, so output is bit-identical under any
  * layout.
  *
  * Emits `array<struct<key long, payload long>>` ascending by
  * (key, payload) — `posexplode` it for ranks.
  */
case class GroupedTopKAgg(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](GroupedTopKAgg.PairOrder)

  override def update(buf: java.util.TreeSet[Array[Long]],
                      input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val kv = sortKey.eval(input)
    val pv = payload.eval(input)
    if (kv == null || pv == null) return buf
    GroupedTopKAgg.add(buf,
      Array(kv.asInstanceOf[Long], pv.asInstanceOf[Long]), k)
    buf
  }

  override def merge(a: java.util.TreeSet[Array[Long]],
                     b: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = b.iterator()
    while (it.hasNext) GroupedTopKAgg.add(a, it.next(), k)
    a
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p(0), p(1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream((buf.size * 2 + 1) * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeLong(p(0)); out.writeLong(p(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) {
      s.add(Array(in.readLong(), in.readLong()))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupedTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupedTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GroupedTopKAgg =
    copy(sortKey = c(0), payload = c(1))
}

object GroupedTopKAgg {
  /** `grouped_top_k(sortKey, payload, k)` aggregate Column. */
  def apply(sortKey: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      GroupedTopKAgg(ColumnBridge.expression(sortKey),
        ColumnBridge.expression(payload), k).toAggregateExpression())

  private[graft] object PairOrder extends java.util.Comparator[Array[Long]] {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(a(1), b(1))
    }
  }

  /** Insert keeping the k smallest distinct (key, payload) pairs. */
  private[graft] def add(buf: java.util.TreeSet[Array[Long]],
                         pair: Array[Long], k: Int): Unit = {
    if (buf.size < k) { buf.add(pair); () }
    else if (PairOrder.compare(pair, buf.last()) < 0) {
      if (buf.add(pair) && buf.size > k) { buf.pollLast(); () }
    }
  }
}
