package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * dedup-key hygiene primitive text pipelines quietly need: "café"
  * composed (U+00E9) and decomposed (e + U+0301) are DIFFERENT byte
  * strings to every hash/groupBy/join in this engine, so the same
  * document crawled from two sources survives exact dedup unless keys
  * normalize first. NFC is the W3C-recommended storage form; the
  * JDK's `java.text.Normalizer` implements the same Unicode algorithm
  * as DuckDB's utf8proc `nfc_normalize`, so the transform is
  * oracle-verifiable byte-for-byte.
  *
  * A native Expression (not a UDF): codegen emits one static call and
  * the projection stays inside whole-stage codegen — and the common
  * case short-circuits, since `Normalizer.isNormalized` is a cheap
  * scan that avoids allocation on already-NFC (in particular,
  * pure-ASCII) text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalizeUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalizeUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Codegen entry point (UTF8String in/out). */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer
      .normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
