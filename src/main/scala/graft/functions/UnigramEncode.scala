package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `string` text → `array<string>` unigram-LM subword pieces:
  * whitespace pre-tokenization, then per-word Viterbi segmentation
  * against a trained piece table ([[graft.operators.Unigram]])
  * carried as a codegen reference object — one static call per row
  * inside WholeStageCodegen, no UDF. Shares the exact `segmentWord`
  * the trainer's E-step uses, so encoding and training can never
  * disagree on a segmentation.
  */
case class UnigramEncodeExpr(child: Expression,
                             pieces: Seq[(String, Long)],
                             maxPieceLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] =
    UnigramEncodeExpr.scoreTable(pieces)

  override def nullSafeEval(v: Any): Any =
    UnigramEncodeExpr.encode(v.asInstanceOf[UTF8String], scores, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramScores", scores,
      "java.util.HashMap<String, Long>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramEncodeExpr.encode($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncodeExpr {
  def apply(c: Column, pieces: Seq[(String, Long)], maxPieceLen: Int): Column =
    ColumnBridge.column(
      UnigramEncodeExpr(ColumnBridge.expression(c), pieces, maxPieceLen))

  def scoreTable(pieces: Seq[(String, Long)])
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  def encode(text: UTF8String,
             scores: java.util.HashMap[String, java.lang.Long],
             maxPieceLen: Int): GenericArrayData = {
    val words = text.toString.trim.split("\\s+")
    val out = Array.newBuilder[Any]
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) {
        val segs = graft.operators.Unigram.segmentWord(words(w), scores, maxPieceLen)
        var i = 0
        while (i < segs.length) {
          out += UTF8String.fromString(segs(i))
          i += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.result())
  }
}
