package graft.marc

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixpoint trailing-punctuation trim — marc/helper.py:169-186
  * (`recursive_sub` over trailing_punct / trailing_period /
  * trailing_bracket, then strip, then lone '.' → '').
  *
  * A fixpoint loop can't be composed from built-in regexp_replace (which
  * replaces a fixed number of times), so this is a native Catalyst
  * Expression. Codegen emits a static call, keeping the projection
  * inside whole-stage codegen.
  */
case class TrimPunctuation(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TrimPunctuation.trim(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.marc.TrimPunctuation.trimUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): TrimPunctuation =
    copy(child = newChild)
}

object TrimPunctuation {
  // Python: re.compile(' *[,\\/;:] *$')
  private val TrailingPunct = Pattern.compile(" *[,\\\\/;:] *$")
  // Python: re.compile('( *[^\\W\\d]{3,})\\.$')  (unicode word chars)
  private val TrailingPeriod =
    Pattern.compile("( *[^\\W\\d]{3,})\\.$", Pattern.UNICODE_CHARACTER_CLASS)
  // Python: re.compile('\\A\\[?([^\\[\\]]+)\\]?\\Z')
  private val TrailingBracket = Pattern.compile("\\A\\[?([^\\[\\]]+)\\]?\\z")

  private def fixpoint(p: Pattern, repl: String, s0: String): String = {
    var s = s0
    while (true) {
      val out = p.matcher(s).replaceAll(repl)
      if (out == s) return s
      s = out
    }
    s
  }

  def trim(s0: String): String = {
    if (s0 == null) return null
    var s = fixpoint(TrailingPunct, "", s0)
    s = fixpoint(TrailingPeriod, "$1", s)
    s = fixpoint(TrailingBracket, "$1", s)
    s = s.strip()
    if (s == ".") "" else s
  }

  /** Codegen entry point (UTF8String in/out). */
  def trimUtf8(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(trim(s.toString))

  def apply(c: Column): Column =
    ColumnBridge.column(TrimPunctuation(ColumnBridge.expression(c)))
}
