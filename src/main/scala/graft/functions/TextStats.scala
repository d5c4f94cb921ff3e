package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document repetition statistics — the Gopher/MassiveText
  * repetition quality filters (duplicate-n-gram and top-n-gram
  * fractions) as ONE pass over the token array.
  *
  * Why native (same reasoning as [[HashSketches]]): a HOF composition
  * would re-evaluate the token array per n-gram lambda site and run
  * interpreted; an explode→groupBy(doc, gram)→groupBy(doc) plan would
  * pay two shuffles of the full gram stream. Per-document state is a
  * few small hash maps — map-side, zero shuffle, stays inside
  * WholeStageCodegen via a single static call. That is the 100 TB
  * shape: repetition scoring touches each document exactly once,
  * co-located with the scan.
  */
object TextStats {

  /** [distinct_token_ratio, top_bigram_frac, dup_trigram_frac] over a
    * token array, raw (un-rounded) doubles:
    *  - distinct tokens / tokens (type-token ratio; 0.0 for no tokens)
    *  - occurrences of the most frequent word 2-gram / total 2-grams
    *    (0.0 when fewer than 2 tokens)
    *  - fraction of 3-gram OCCURRENCES whose 3-gram appears more than
    *    once (0.0 when fewer than 3 tokens)
    */
  def repetitionStats(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }

    val distinct = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val distinctRatio = if (n == 0) 0.0 else distinct.size.toDouble / n

    val topBigram = gramCounts(toks, 2) match {
      case null => 0.0
      case m =>
        var max = 0
        val it = m.values().iterator()
        while (it.hasNext) { val c = it.next().value; if (c > max) max = c }
        max.toDouble / (n - 1)
    }

    val dupTrigram = gramCounts(toks, 3) match {
      case null => 0.0
      case m =>
        var dup = 0
        val it = m.values().iterator()
        while (it.hasNext) { val c = it.next().value; if (c > 1) dup += c }
        dup.toDouble / (n - 2)
    }

    new GenericArrayData(Array[Double](distinctRatio, topBigram, dupTrigram))
  }

  private final class Counter { var value = 0 }

  /** Counts of space-joined word `g`-grams, or null when the document
    * has no complete gram.
    */
  private def gramCounts(toks: Array[UTF8String], g: Int)
      : java.util.HashMap[UTF8String, Counter] = {
    val n = toks.length
    if (n < g) return null
    val m = new java.util.HashMap[UTF8String, Counter]()
    var i = 0
    while (i <= n - g) {
      val parts = new Array[UTF8String](2 * g - 1)
      var p = 0
      var j = i
      while (j < i + g) {
        if (j > i) { parts(p) = Space; p += 1 }
        parts(p) = toks(j)
        p += 1
        j += 1
      }
      val gram = UTF8String.concat(parts: _*)
      var c = m.get(gram)
      if (c == null) { c = new Counter; m.put(gram, c) }
      c.value += 1
      i += 1
    }
    m
  }

  private val Space = UTF8String.fromString(" ")

  /** Normalizer.normalize with an already-normalized fast path: NFC
    * text (the overwhelming majority of real corpora) skips the
    * decompose/recompose allocation entirely.
    */
  def normalizeUnicode(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** `[n_chars, entropy_micro]` — see [[CharEntropyExpr]]. */
  def charEntropy(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      n += 1
    }
    if (n == 0L) return new GenericArrayData(Array(0L, 0L))
    // Σ cᵢ·q(cᵢ) exactly, q(x) = round_half_up(1e6·ln x); q(1) = 0
    var ssum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > 1L) ssum += c * Math.round(1e6 * Math.log(c.toDouble))
    }
    val entropy = Math.round(1e6 * Math.log(n.toDouble)) -
      (2L * ssum + n) / (2L * n)
    new GenericArrayData(Array(n, entropy))
  }
}

/** `array<string>` tokens → `array<double>` of
  * [distinct_token_ratio, top_bigram_frac, dup_trigram_frac].
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() = {
    require(child.dataType == ArrayType(StringType, true) ||
            child.dataType == ArrayType(StringType, false),
      s"expected array<string>, got ${child.dataType}")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullSafeEval(v: Any): Any =
    TextStats.repetitionStats(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStats.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(c)))
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * the canonicalization step every multilingual corpus pipeline runs
  * before hashing/dedup (Spark has no built-in for it; a UDF would
  * leave whole-stage codegen). Wraps `java.text.Normalizer`, whose
  * output agrees with utf8proc (DuckDB's `nfc_normalize`) on the
  * standard normalization forms, so the op is oracle-verifiable.
  */
case class NormalizeUnicodeExpr(child: Expression, form: String)
    extends UnaryExpression {
  require(NormalizeUnicodeExpr.Forms(form),
    s"form must be one of ${NormalizeUnicodeExpr.Forms.mkString("/")}, got '$form'")
  // resolved once per task, not per row
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    require(child.dataType == StringType,
      s"expected string, got ${child.dataType}")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullSafeEval(v: Any): Any =
    TextStats.normalizeUnicode(v.asInstanceOf[UTF8String], f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normForm", f, "java.text.Normalizer$Form")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStats.normalizeUnicode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicodeExpr =
    copy(child = newChild)
}

object NormalizeUnicodeExpr {
  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")
  def apply(c: Column, form: String): Column =
    ColumnBridge.column(NormalizeUnicodeExpr(ColumnBridge.expression(c), form))
}

/** Evaluate-once barrier: a pass-through that REPORTS non-determinism
  * so the optimizer never inlines the child into its consumers.
  *
  * Why: CollapseProject + PushDownPredicate substitute a projected
  * alias into every reference site — an expensive aliased expression
  * (a `from_json` parse, a sketch) referenced by k downstream
  * expressions is then evaluated k times per row. The usual fix is an
  * explode(array(…)) Generate barrier, but the Generate node itself
  * costs more than the duplicated work it saves for single-struct
  * payloads (measured in graft.Debug: 1.9s parse vs 4.4s behind the
  * explode barrier at sf0.1). This wrapper keeps the plan a plain
  * Project — full codegen, no Generate — while the non-determinism
  * flag stops alias substitution, pinning exactly one evaluation per
  * row. The child MUST itself be deterministic (the flag is a plan-
  * shape device, not a semantics change).
  */
case class OncePerRowExpr(child: Expression) extends UnaryExpression {
  // the flag below is a plan-shape device, NOT a semantics change —
  // reject genuinely nondeterministic children outright (their single
  // evaluation would otherwise be silently laundered as reproducible)
  require(child.deterministic,
    s"OncePerRowExpr child must be deterministic: $child")
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OncePerRowExpr =
    copy(child = newChild)
}

object OncePerRowExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(OncePerRowExpr(ColumnBridge.expression(c)))
}

/** Per-document character (code-point) Shannon entropy in exact
  * integer MICRO-nats — the MassiveText/CCNet-style "is this natural
  * text or noise" signal (uniform noise scores high, repeated filler
  * scores near zero).
  *
  * `H = ln N − (Σ cᵢ·ln cᵢ)/N` over code-point counts cᵢ, with every
  * `ln x` quantized to `round_half_up(10⁶·ln x)` per DISTINCT integer
  * x (the perplexity_score device): the weighted sum is then exact
  * integer arithmetic and the mean is integer round-half-up
  * `(2S+N) div (2N)` — order-independent and bit-reproducible across
  * engines, with the same documented ~1e-9-per-distinct-value libm
  * boundary caveat as the LM scores.
  *
  * One pass per document over a small per-row hash map — map-side,
  * zero shuffle, inside WholeStageCodegen via a single static call
  * (the [[RepetitionStatsExpr]] shape). Returns
  * `[n_chars, entropy_micro]`; empty text → `[0, 0]`.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes() = {
    require(child.dataType == StringType,
      s"expected string, got ${child.dataType}")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullSafeEval(v: Any): Any =
    TextStats.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStats.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(c)))
}
