package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a custom Catalyst aggregate —
  * the bounded-memory "what are the frequent tokens" primitive a
  * 100 TB corpus needs: a full `groupBy(token)` shuffles the entire
  * token stream to count everything, while this keeps at most
  * `capacity` counters per partial aggregate, merges associatively
  * map-side (classic mergeable-summaries result: the merged sketch
  * obeys the same error bound), and moves only `O(capacity)` bytes per
  * partition through the shuffle.
  *
  * Guarantees (standard Misra-Gries): reported count ∈
  * [true − N/(capacity+1), true]; every item with true count >
  * N/(capacity+1) is present in the sketch. When `capacity` ≥ the
  * number of distinct items no decrement ever fires and the sketch is
  * EXACT — which is what makes the operator oracle-verifiable against
  * a plain SQL count at test scale while still being the sketch you
  * would run at 100 TB.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  /** Classic MG update: count if tracked or space free, else decrement
    * every counter (dropping zeros) — each decrement "spends" one
    * occurrence of capacity+1 distinct items.
    */
  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
                      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String]
    val cur: java.lang.Long = buf.get(s)
    if (cur != null || buf.size < capacity) {
      // copy: eval may return a pointer into a reused row buffer
      if (cur != null) buf.put(s, java.lang.Long.valueOf(cur + 1L))
      else buf.put(s.clone(), java.lang.Long.valueOf(1L))
    } else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue - 1L))
      }
    }
    buf
  }

  /** Mergeable-summaries merge: add counts, then shrink back to
    * `capacity` by subtracting the (capacity+1)-th largest count from
    * every counter (equivalent to that many joint decrements).
    */
  override def merge(a: java.util.HashMap[UTF8String, java.lang.Long],
                     b: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val cur: java.lang.Long = a.get(e.getKey)
      a.put(e.getKey,
        if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (a.size > capacity) {
      val counts = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1) // (capacity+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue - cut))
      }
    }
    a
  }

  /** Deterministic output: est_count desc, token asc. */
  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortWith { case ((ta, ca), (tb, cb)) =>
      if (ca != cb) ca > cb else ta.compareTo(tb) < 0
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c.head)
}

object MisraGriesAgg {
  /** `approx_top_tokens(col, capacity)` aggregate Column. */
  def apply(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
