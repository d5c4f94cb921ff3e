package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for product quantization (PQ).
  *
  * PQ splits a d-dim vector into `m` subvectors and quantizes each
  * against its own `ksub`-centroid codebook, so a vector stores as m
  * small codes instead of d floats (m=8, ksub=16 on d=64 floats:
  * 256 B → 8 codes — the memory story that lets a 100 TB embedding
  * corpus ADC-scan from RAM). Asymmetric distance computation (ADC)
  * keeps the query exact: one m×ksub lookup table of
  * query-subvector · sub-centroid dot products per QUERY, then each
  * candidate scores with m table lookups instead of a d-term dot
  * product.
  *
  * All three steps are single static calls inside WholeStageCodegen
  * with the codebook matrix carried as a codegen reference object —
  * the same pattern as [[NearestCellsExpr]].
  */
object Pq {

  /** Nearest sub-centroid (squared-L2, ties → lower index) per
    * subspace. `books` is m × ksub × subdim.
    */
  def encode(vec: ArrayData, books: Array[Array[Array[Double]]],
             isFloat: Boolean): ArrayData = {
    val m = books.length
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val subdim = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val x = (if (isFloat) vec.getFloat(off + i).toDouble
                   else vec.getDouble(off + i)) - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      off += subdim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Flat m·ksub ADC lookup table for one query vector:
    * lut(s·ksub + c) = query-subvector(s) · sub-centroid(s, c).
    */
  def lut(vec: ArrayData, books: Array[Array[Array[Double]]],
          isFloat: Boolean): ArrayData = {
    val m = books.length
    val ksub = books(0).length
    val out = new Array[Double](m * ksub)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val subdim = book(0).length
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < subdim) {
          acc += (if (isFloat) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)) * cent(i)
          i += 1
        }
        out(s * ksub + c) = acc
        c += 1
      }
      off += subdim
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_s lut(s·ksub + codes(s)) ≈ query · candidate. */
  def adc(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    var acc = 0.0
    var s = 0
    val m = codes.numElements()
    while (s < m) {
      acc += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }
}

/** `array<float|double>` vector → `array<int>` of m PQ codes. */
case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    Pq.encode(v.asInstanceOf[ArrayData], matrix, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", matrix, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Pq.encode($c, $ref, $elemIsFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  def apply(c: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(c), books))
}

/** `array<float|double>` query vector → flat `array<double>` ADC table. */
case class PqLutExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    Pq.lut(v.asInstanceOf[ArrayData], matrix, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", matrix, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Pq.lut($c, $ref, $elemIsFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

object PqLutExpr {
  def apply(c: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(c), books))
}

/** (lut `array<double>`, codes `array<int>`) → ADC score `double`. */
case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(lut: Any, codes: Any): Any =
    Pq.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, c) => s"graft.functions.Pq.adc($l, $c, $ksub)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdcExpr {
  def apply(lut: Column, codes: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcExpr(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes), ksub))
}
