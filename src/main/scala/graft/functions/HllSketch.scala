package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog registers as a custom Catalyst aggregate — the
  * fixed-size cardinality sketch completing the sketch family next to
  * [[KmvSketchAgg]] (KMV keeps set ALGEBRA — intersections; HLL is
  * the smaller, constant-size union-only counter production systems
  * default to). State: `m = 2^p` byte registers, each the max
  * first-one position (`rho`) of the hashed values routed to it —
  * elementwise-max mergeable, so partials combine associatively
  * map-side and the result is a pure function of the input VALUE SET
  * (bit-identical under any layout, replay, or merge order).
  *
  * ENGINE-EXACT BY CONSTRUCTION, not by tolerance: the value hash is
  * the same splitmix64 the KMV sketch uses (re-derived in the oracle
  * as pure HUGEINT mod-2^64 arithmetic), the register index is the low
  * `p` hash bits, `rho` is the first-one position of the remaining
  * `64−p` bits (oracle: `strpos` over the padded binary STRING — no
  * float anywhere in the hash path), and [[HllSketch.estimateExpr]]
  * quantizes the only two transcendental steps (the alpha constant as
  * a plan-time permyriad literal; linear counting's `ln` via the
  * psi_drift round-to-micro-nat device) so both engines compute the
  * IDENTICAL estimate. Spark's own `approx_count_distinct` is also
  * HLL but its estimate is not reproducible outside Spark — this one
  * is the cross-engine-auditable twin.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    // raw splitmix64 (hashAny's KMV sign flip undone)
    val h = KmvSketchAgg.hashAny(v) ^ java.lang.Long.MIN_VALUE
    val idx = (h & (m - 1)).toInt
    val bits = h >>> p
    val rho =
      if (bits == 0L) (64 - p + 1)
      else java.lang.Long.numberOfLeadingZeros(bits) - p + 1
    if (rho > buf(idx)) buf(idx) = rho.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
}

/** Merge PRE-BUILT HLL register arrays (elementwise max) — the read
  * half of any persisted-partials store, mirroring [[KmvMergeAgg]]:
  * batch-stamped register partials fold back to exactly the sketch of
  * the union, byte-identical under any merge order.
  */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == m,
      s"hll_merge: expected $m registers, got ${arr.numElements()}")
    var i = 0
    while (i < m) {
      val r = arr.getLong(i)
      if (r > buf(i)) buf(i) = r.toByte
      i += 1
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
}

object HllSketch {
  /** `hll_sketch(col, p)` aggregate Column → `array<long>` registers. */
  def sketch(c: Column, p: Int): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(c), p).toAggregateExpression())

  /** `hll_merge(registers, p)` — fold register partials back together. */
  def merge(c: Column, p: Int): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(c), p).toAggregateExpression())

  /** Plan-time alpha constant: `round(10⁴·0.7213/(1+1.079/m))` —
    * driver-side double math folded to a LITERAL, so both engines see
    * the same integer. */
  def alphaPermyriad(p: Int): Long =
    math.round(10000.0 * 0.7213 / (1.0 + 1.079 / (1 << p)))

  /** The engine-exact estimate from a register array (see class doc):
    *  - `Z = Σ 2^(57−min(rho,57))` in DECIMAL(38,0)/HUGEINT (the
    *    2^-rho harmonic sum scaled by 2^57 so every term is an exact
    *    integer),
    *  - `raw = (alpha_pm · m² · 2^57) div (10⁴ · Z)` — truncating
    *    integral division both engines,
    *  - linear counting `lc = (m · round(ln(m/V)·10⁶)) div 10⁶` when
    *    any register is empty and `raw ≤ 5m/2` (the standard HLL
    *    small-range correction; `ln` quantized to micro-nats — the
    *    psi_drift device).
    * Contract: register arrays come from [[HllSketchAgg]] on real
    * data (rho ≤ 57 for p=8), where `raw` fits a BIGINT comfortably.
    */
  def estimateExpr(regsCol: String, p: Int): Column = {
    val m = 1 << p
    val maxRho = 64 - p + 1
    val num = (BigInt(alphaPermyriad(p)) * m * m * (BigInt(1) << maxRho))
      .toString
    val zv = s"""aggregate($regsCol, CAST(0 AS DECIMAL(38,0)),
      (acc, x) -> acc + CAST(shiftleft(CAST(1 AS BIGINT),
        $maxRho - CAST(least(x, ${maxRho}L) AS INT)) AS DECIMAL(38,0)))"""
    val v = s"size(filter($regsCol, x -> x = 0))"
    val raw = s"CAST(CAST($num AS DECIMAL(38,0)) div (10000 * $zv) AS BIGINT)"
    val lc = s"""(${m}L * CAST(round(ln(CAST($m AS DOUBLE) / $v) * 1000000.0)
      AS BIGINT)) div 1000000L"""
    expr(s"""CASE WHEN $v > 0 AND $raw <= ${5 * m / 2}L THEN $lc
             ELSE $raw END""")
  }
}
