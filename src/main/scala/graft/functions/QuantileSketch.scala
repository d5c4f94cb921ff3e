package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One level of the sketch: a growable primitive long buffer (no
  * boxing on the per-row hot path). */
private[functions] final class LongBuf(initial: Int = 16) {
  var a: Array[Long] = new Array[Long](initial)
  var size: Int = 0
  def add(v: Long): Unit = {
    if (size == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    a(size) = v; size += 1
  }
  def sortInPlace(): Unit = java.util.Arrays.sort(a, 0, size)
}

/** Mergeable quantile-sketch buffer: KLL/MRL-style level buffers with
  * DETERMINISTIC alternating compaction (no randomness — replay- and
  * retry-stable, per the house reproducibility discipline).
  *
  * Level `h` holds items of weight `2^h`. A full level is sorted and
  * every second item (alternating offset per compaction) is promoted
  * one level up; the classic compaction argument bounds the rank
  * error any single compaction can introduce by the level weight, so
  * the sketch carries its own EXACT worst-case bound in `errBound`
  * (the sum of weights over all compactions ever performed, merges
  * included). When the per-level capacity `k` is at least the group
  * size, no compaction fires, `errBound` stays 0, and every quantile
  * is exact — the oracle-verifiable regime.
  */
final class KllBuffer(val k: Int) {
  var n: Long = 0L
  var errBound: Long = 0L
  private[functions] val levels =
    scala.collection.mutable.ArrayBuffer(new LongBuf())
  private[functions] val flips = scala.collection.mutable.ArrayBuffer(false)

  private def ensureLevel(h: Int): Unit =
    while (levels.size <= h) { levels += new LongBuf(); flips += false }

  /** Sort level `h`, promote alternating survivors to `h+1`, charge
    * `2^h` to the error bound. Cascades if `h+1` overflows. */
  private def compact(h: Int): Unit = {
    val buf = levels(h)
    buf.sortInPlace()
    ensureLevel(h + 1)
    val up = levels(h + 1)
    var i = if (flips(h)) 1 else 0
    flips(h) = !flips(h)
    while (i < buf.size) { up.add(buf.a(i)); i += 2 }
    buf.size = 0
    errBound += (1L << h)
    if (up.size > k) compact(h + 1)
  }

  def insert(v: Long): Unit = {
    levels(0).add(v)
    n += 1
    if (levels(0).size > k) compact(0)
  }

  def mergeIn(o: KllBuffer): Unit = {
    n += o.n
    errBound += o.errBound
    var h = 0
    while (h < o.levels.size) {
      if (o.levels(h).size > 0) {
        ensureLevel(h)
        val dst = levels(h); val src = o.levels(h)
        var i = 0
        while (i < src.size) { dst.add(src.a(i)); i += 1 }
      }
      h += 1
    }
    h = 0
    while (h < levels.size) {
      if (levels(h).size > k) compact(h)
      h += 1
    }
  }

  /** Sort every level's buffer in place. After canonicalization the
    * wire bytes are a pure function of the per-level CONTENT multisets
    * — in the exact regime (no compaction ever fired, everything lives
    * at level 0) that makes the serialized sketch independent of
    * insertion and merge order entirely; in the compacted regime it
    * removes order noise within levels but which items were promoted
    * still depends on compaction history. Used by the persisted
    * quantile store so a folded partial has stable bytes. */
  def canonicalize(): Unit = {
    var h = 0
    while (h < levels.size) { levels(h).sortInPlace(); h += 1 }
  }

  /** Weighted items sorted by value. */
  def weighted(): Array[(Long, Long)] = {
    val out = Array.newBuilder[(Long, Long)]
    var h = 0
    while (h < levels.size) {
      val buf = levels(h); val w = 1L << h
      var i = 0
      while (i < buf.size) { out += ((buf.a(i), w)); i += 1 }
      h += 1
    }
    out.result().sortBy(_._1)
  }

  /** Value covering 0-based rank `r` in the weighted sorted stream. */
  def valueAtRank(r: Long): Long = {
    val items = weighted()
    var cum = 0L; var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum > r) return items(i)._1
      i += 1
    }
    items(items.length - 1)._1
  }
}

object KllBuffer {
  /** Wire form shared by the aggregate's shuffle partials and the
    * streaming state store (same bytes either way — a sketch is a
    * sketch). */
  def toBytes(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeLong(buf.errBound)
    out.writeInt(buf.levels.size)
    var h = 0
    while (h < buf.levels.size) {
      out.writeBoolean(buf.flips(h))
      val b = buf.levels(h)
      out.writeInt(b.size)
      var i = 0
      while (i < b.size) { out.writeLong(b.a(i)); i += 1 }
      h += 1
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(in.readInt())
    buf.n = in.readLong()
    buf.errBound = in.readLong()
    val nLevels = in.readInt()
    var h = 0
    while (h < nLevels) {
      if (h > 0) { buf.levels += new LongBuf(); buf.flips += false }
      buf.flips(h) = in.readBoolean()
      val sz = in.readInt()
      var i = 0
      while (i < sz) { buf.levels(h).add(in.readLong()); i += 1 }
      h += 1
    }
    buf
  }

  /** Inverse-CDF (type-1) quantile answers for `phis` — the same rank
    * rule the aggregate's eval uses. Empty sketch → empty. */
  def quantiles(buf: KllBuffer, phis: Seq[Double]): Seq[Long] =
    if (buf.n == 0L) Seq.empty
    else phis.map { p =>
      val r = math.max(0L, math.ceil(p * buf.n).toLong - 1L)
      buf.valueAtRank(math.min(r, buf.n - 1L))
    }
}

/** `quantile_sketch(col, k, phis)` — mergeable deterministic quantile
  * sketch over a LONG column (integer micros/cents per the house
  * fixed-point discipline).
  *
  * Why not Spark's exact `percentile`: it buffers EVERY group value in
  * the aggregation buffer — at 100 TB a hot group OOMs the executor.
  * This sketch keeps `O(k · log(n/k))` longs per partial aggregate,
  * merges associatively map-side, and ships only the sketch through
  * the shuffle, while carrying its own worst-case rank-error bound so
  * callers can ASSERT the accuracy they got.
  *
  * Output: `struct(n, err_bound, qs array<long>)`, one `qs` entry per
  * requested `phi` using inverse-CDF (type-1) rank semantics
  * `max(0, ceil(phi·n) − 1)` — DuckDB `quantile_disc` parity, IEEE
  * product both engines. `err_bound` is an exact deterministic bound:
  * the true rank of `qs(i)` is within `err_bound` of the target rank.
  * With `k ≥ n` it is 0 and the result is exact under ANY partition
  * layout (compaction can only trigger past `k` buffered items).
  */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    phis: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, s"k must be >= 8, got $k")
  require(phis.nonEmpty, "phis must be non-empty")
  require(phis.forall(p => p >= 0.0 && p <= 1.0),
    s"phis must be in [0,1], got $phis")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("qs", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    a.mergeIn(b); a
  }

  override def eval(buf: KllBuffer): Any = {
    val qs: Array[Any] =
      if (buf.n == 0L) Array.empty[Any]
      else phis.map { p =>
        val r = math.max(0L, math.ceil(p * buf.n).toLong - 1L)
        buf.valueAtRank(math.min(r, buf.n - 1L)): Any
      }.toArray
    InternalRow(buf.n, buf.errBound, new GenericArrayData(qs))
  }

  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllQuantilesAgg =
    copy(child = c.head)
}

object KllQuantilesAgg {
  /** `quantile_sketch(col, k, phis)` aggregate Column. */
  def apply(c: Column, k: Int, phis: Seq[Double]): Column =
    ColumnBridge.column(
      KllQuantilesAgg(ColumnBridge.expression(c), k, phis)
        .toAggregateExpression())
}

/** `kll_merge(sketchBytes, k, phis)` — merge PRE-BUILT sketch wire
  * bytes (the [[KllBuffer]] serialization) instead of raw values: the
  * read half of the persisted quantile store, where each input row is
  * already a per-(key, batch) sketch partial and the aggregate only
  * folds partials together. `O(k·log n)` state like the value-input
  * sibling; merging is associative so partials combine map-side.
  *
  * With `emitSketch = true` the output is the merged sketch's
  * CANONICALIZED wire bytes (per-level sort — byte-deterministic in
  * the exact regime regardless of merge order) instead of quantile
  * answers — the store's compaction fold uses this to collapse
  * committed batch partials into one stored row per key.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    phis: Seq[Double],
    emitSketch: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, s"k must be >= 8, got $k")
  require(emitSketch || phis.nonEmpty, "phis must be non-empty")
  require(phis.forall(p => p >= 0.0 && p <= 1.0),
    s"phis must be in [0,1], got $phis")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitSketch) BinaryType
    else StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("err_bound", LongType, nullable = false),
      StructField("qs", ArrayType(LongType, containsNull = false),
        nullable = false)))

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.mergeIn(KllBuffer.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    a.mergeIn(b); a
  }

  override def eval(buf: KllBuffer): Any =
    if (emitSketch) { buf.canonicalize(); KllBuffer.toBytes(buf) }
    else {
      val qs: Array[Any] = KllBuffer.quantiles(buf, phis).map(x => x: Any).toArray
      InternalRow(buf.n, buf.errBound, new GenericArrayData(qs))
    }

  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c.head)
}

object KllMergeAgg {
  /** Quantile answers from merged sketch-bytes rows. */
  def apply(c: Column, k: Int, phis: Seq[Double]): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c), k, phis)
        .toAggregateExpression())

  /** Merged + canonicalized sketch bytes (the compaction fold). */
  def sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c), k, Seq.empty,
        emitSketch = true).toAggregateExpression())
}
