package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern substring automaton — the blocklist /
  * watchlist primitive (safety term filtering, PII keyword sweeps,
  * license-string detection) at corpus scale.
  *
  * Why an automaton and why native: `|patterns|` separate `contains()`
  * calls rescan every document once per pattern, and a regex
  * alternation pays NFA backtracking; Aho-Corasick scans each document
  * ONCE regardless of pattern count. The automaton is built once
  * driver-side per expression instance and rides to executors as a
  * reference object (the [[LshBucketsExpr]] hyperplane-matrix device);
  * per row the scan is a single static call inside WholeStageCodegen —
  * map-side, zero shuffle.
  *
  * Matching is case-sensitive over Java chars (UTF-16 code units);
  * multi-char patterns cross code-point boundaries correctly because
  * a UTF-16 substring match IS a string substring match.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  import AhoCorasick.Node

  private val root = new Node()

  {
    var pi = 0
    while (pi < patterns.length) {
      var node = root
      val p = patterns(pi)
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        var nxt = node.children.get(c)
        if (nxt == null) { nxt = new Node(); node.children.put(c, nxt) }
        node = nxt
        i += 1
      }
      node.out = pi :: node.out
      pi += 1
    }
    // BFS failure links; out lists merge along fail chains so matches
    // ending mid-chain surface without walking fails at scan time
    val queue = new java.util.ArrayDeque[Node]()
    root.fail = root
    root.children.values().forEach { n => n.fail = root; queue.add(n) }
    while (!queue.isEmpty) {
      val cur = queue.poll()
      cur.children.forEach { (c, n) =>
        var f = cur.fail
        while ((f ne root) && f.children.get(c) == null) f = f.fail
        val cand = f.children.get(c)
        n.fail = if (cand != null && (cand ne n)) cand else root
        n.out = n.out ::: n.fail.out
        queue.add(n)
      }
    }
  }

  /** Distinct matched pattern indices, ascending. */
  def matchedPatterns(text: String): Array[Int] = {
    var node = root
    val found = new java.util.TreeSet[Integer]()
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while ((node ne root) && node.children.get(c) == null) node = node.fail
      val nxt = node.children.get(c)
      if (nxt != null) node = nxt
      var o = node.out
      while (o.nonEmpty) { found.add(o.head); o = o.tail }
      i += 1
    }
    val out = new Array[Int](found.size)
    val it = found.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

object AhoCorasick {
  private[functions] final class Node extends Serializable {
    val children = new java.util.HashMap[Character, Node]()
    var fail: Node = null
    var out: List[Int] = Nil
  }
}

/** `string` → `array<string>` of the DISTINCT patterns occurring as
  * substrings, in pattern-list order. Explode for (doc, pattern) rows.
  */
case class MultiMatchExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    require(child.dataType == StringType,
      s"expected string, got ${child.dataType}")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val automaton = new AhoCorasick(patterns.toArray)
  @transient private lazy val utf8Patterns: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  override def nullSafeEval(v: Any): Any =
    MultiMatchExpr.matched(v.asInstanceOf[UTF8String], automaton, utf8Patterns)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", automaton,
      "graft.functions.AhoCorasick")
    val patRef = ctx.addReferenceObj("utf8Patterns", utf8Patterns,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultiMatchExpr.matched($c, $acRef, $patRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiMatchExpr =
    copy(child = newChild)
}

object MultiMatchExpr {
  def apply(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      MultiMatchExpr(ColumnBridge.expression(c), patterns))

  def matched(s: UTF8String, ac: AhoCorasick,
              pats: Array[UTF8String]): ArrayData = {
    val ixs = ac.matchedPatterns(s.toString)
    val out = new Array[Any](ixs.length)
    var i = 0
    while (i < ixs.length) { out(i) = pats(ixs(i)); i += 1 }
    new GenericArrayData(out)
  }
}
