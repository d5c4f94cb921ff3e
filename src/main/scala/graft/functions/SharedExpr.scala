package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{CommonExpressionDef, CommonExpressionRef, CreateNamedStruct, Literal, With}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Evaluate-once projection over a shared expensive expression, built
  * on Spark's NATIVE common-subexpression machinery
  * (`With`/`CommonExpressionRef`, the device RuntimeReplaceable
  * expressions use): every output column references the shared
  * expression through a typed `CommonExpressionRef`, and the
  * optimizer's `RewriteWithExpression` hoists ONE evaluation into its
  * own Project below the consumers.
  *
  * This is the determinism-PRESERVING alternative to
  * [[OncePerRowExpr]]: the shared child keeps `deterministic = true`,
  * so predicate pushdown through the projection still works and none
  * of the barrier's side effects apply (ADVICE r3). The barrier
  * remains for call sites that need the evaluation pinned inside a
  * single Project node; new multi-consumer extractions should prefer
  * this.
  *
  * Mechanics: `With` is normally constructed post-analysis (its
  * builder is private[sql]), so the ref's data type is probed by
  * analyzing `shared` against `df` first, then the def/ref pair is
  * assembled from the public constructors. `build` receives the ref
  * as a Column and returns (name, column) output pairs.
  *
  * LIMITATION (measured, graft.Debug r4): output columns must not
  * contain RuntimeReplaceable expressions (`try_to_timestamp`,
  * `nullif`-family rewrites, …) — those expand into their OWN `With`
  * during optimization, and nested With defs orphan this one
  * (`NoSuchElementException: key not found: CommonExpressionId`;
  * Spark documents that With cannot nest). Plain field
  * extraction/arithmetic works and beats the barrier (3.5s vs 4.3s
  * over 600k webhook payloads); the webhook production route needs
  * lenient timestamp parsing, so it stays on the barrier.
  */
object SharedExpr {

  def select(df: DataFrame, shared: Column)
            (build: Column => Seq[(String, Column)]): DataFrame = {
    // resolve the shared expression's type: CommonExpressionRef is a
    // typed leaf, so it must carry the real post-analysis type
    val probe = df.select(shared.as("__probe")).schema.head
    val defn = CommonExpressionDef(ColumnBridge.expression(shared))
    val ref = new CommonExpressionRef(defn.id, probe.dataType, probe.nullable)
    val pairs = build(ColumnBridge.column(ref))
    val names = pairs.map(_._1)
    val w = With(
      CreateNamedStruct(pairs.flatMap { case (n, c) =>
        Seq(Literal(n), ColumnBridge.expression(c)) }),
      Seq(defn))
    df.select(ColumnBridge.column(w).as("__shared"))
      .select(names.map(n => col("__shared").getField(n).as(n)): _*)
  }
}
