package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `string` text → `array<string>` BPE subword tokens: whitespace
  * pre-tokenization, then per-word greedy lowest-rank merge encoding
  * against a trained merge table ([[graft.operators.Bpe]]) carried as
  * a codegen reference object — one static call per row inside
  * WholeStageCodegen, no UDF, no per-row table lookup setup.
  */
case class BpeEncodeExpr(child: Expression,
                         merges: Seq[(String, String, Int)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncodeExpr.rankTable(merges)

  override def nullSafeEval(v: Any): Any =
    BpeEncodeExpr.encode(v.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeExpr.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  def apply(c: Column, merges: Seq[(String, String, Int)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(c), merges))

  def rankTable(merges: Seq[(String, String, Int)])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.foreach { case (l, r, rank) => m.put(l + " " + r, Integer.valueOf(rank)) }
    m
  }

  def encode(text: UTF8String,
             ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val words = text.toString.trim.split("\\s+")
    val out = Array.newBuilder[Any]
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val syms = graft.operators.Bpe.encodeWord(words(w), ranks)
        var i = 0
        while (i < syms.length) {
          out += UTF8String.fromString(syms(i))
          i += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.result())
  }
}
