package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** First and second moments of a vector column in ONE pass, as a
  * custom Catalyst aggregate with model-sized state — the covariance
  * primitive behind [[graft.operators.Pca]].
  *
  * Determinism device (the tfidf/perplexity discipline applied to
  * linear algebra): each component is quantized ONCE map-side to
  * integer micro-units `q = rint(x · 2^scaleBits)`, and everything
  * summed after that is EXACT integer arithmetic — n, Σq_i, and the
  * upper triangle of Σ q_i·q_j. Integer sums are associative and
  * commutative, so the aggregate is bit-identical under any partition
  * layout, task order, or engine — unlike a double-accumulated
  * covariance, whose fp rounding depends on merge order.
  *
  * State is O(dim²) longs (dim=64 → ~17 KB), independent of row
  * count; merges are elementwise adds. Overflow bound: with
  * scaleBits=10 and components |x| ≤ ~2, each product is ≤ ~2^22, so
  * long sums are safe past 2^40 (~10^12) rows — 100 TB scale — and
  * `Math.addExact` turns a breach into a loud error, never a silent
  * wrap.
  */
case class VectorMomentsAgg(
    child: Expression,
    dim: Int,
    scaleBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0 && scaleBits > 0 && scaleBits < 30)

  // buffer layout: [n, sum(0..dim-1), upperTriangle(i<=j) row-major]
  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"expected $dim-dim vector, got ${arr.numElements()}")
    val isF = elemIsFloat
    val scale = (1L << scaleBits).toDouble
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = Math.rint(x * scale).toLong
      i += 1
    }
    buf(0) = Math.addExact(buf(0), 1L)
    i = 0
    var t = 1 + dim
    while (i < dim) {
      buf(1 + i) = Math.addExact(buf(1 + i), q(i))
      var j = i
      while (j < dim) {
        buf(t) = Math.addExact(buf(t), q(i) * q(j))
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorMomentsAgg =
    copy(child = c.head)
}

object VectorMomentsAgg {
  def apply(c: Column, dim: Int, scaleBits: Int): Column =
    ColumnBridge.column(
      VectorMomentsAgg(ColumnBridge.expression(c), dim, scaleBits)
        .toAggregateExpression())
}

/** `array<float|double>` vector → `array<double>` of the k principal
  * components' projections, with the l2 residual (reconstruction
  * error) appended as element k: `[p_1..p_k, err]`. Mean and component
  * matrix ride as codegen reference objects — per row one (k × dim)
  * mat-vec in a static call inside WholeStageCodegen, no UDF.
  *
  * The residual uses orthonormality: ||x−μ−VᵀVx̃||² = ||x−μ||² − Σp²
  * (clamped at 0 against fp cancellation) — no d×k reconstruction
  * loop.
  */
case class PcaProjectExpr(child: Expression, mean: Seq[Double],
                          components: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val mat: Array[Array[Double]] =
    components.map(_.toArray).toArray

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    PcaProjectExpr.project(v.asInstanceOf[ArrayData], mu, mat, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMean", mu, "double[]")
    val matRef = ctx.addReferenceObj("pcaComponents", mat, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PcaProjectExpr.project($c, $muRef, $matRef, $elemIsFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

object PcaProjectExpr {
  def apply(c: Column, mean: Seq[Double], components: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PcaProjectExpr(ColumnBridge.expression(c), mean, components))

  def project(vec: ArrayData, mu: Array[Double], mat: Array[Array[Double]],
              isFloat: Boolean): ArrayData = {
    val dim = mu.length
    val n = math.min(vec.numElements(), dim)
    val c = new Array[Double](dim)
    var normSq = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      c(i) = x - mu(i)
      normSq += c(i) * c(i)
      i += 1
    }
    val k = mat.length
    val out = new Array[Any](k + 1)
    var projSq = 0.0
    var r = 0
    while (r < k) {
      val row = mat(r)
      var s = 0.0
      var j = 0
      while (j < dim) { s += c(j) * row(j); j += 1 }
      out(r) = java.lang.Double.valueOf(s)
      projSq += s * s
      r += 1
    }
    out(k) = java.lang.Double.valueOf(math.sqrt(math.max(0.0, normSq - projSq)))
    new GenericArrayData(out)
  }
}
