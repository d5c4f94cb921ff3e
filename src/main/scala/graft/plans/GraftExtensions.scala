package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: a naive interval-containment join
  * (`point >= lo AND point <= hi`, no equi keys) has no join keys, so
  * Spark plans a nested-loop join — quadratic, and a cluster-killer
  * when neither side broadcasts. This rule rewrites it into the
  * bucketed shape of [[graft.operators.Relational.bucketedRangeJoin]]
  * automatically: intervals explode into the fixed-width buckets they
  * cover, points hash to their bucket, and the join becomes a plain
  * equi-join on the bucket id + the original range condition as a
  * residual filter.
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucketSize` (default
  * 1000) — pick it near the median interval width. Conjuncts beyond
  * the range pair (e.g. inferred IsNotNull) are preserved. The rule
  * never rematches its own output (the rewrite contains an equi
  * conjunct, which disqualifies the pattern).
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSizeKey = "spark.graft.rangeJoin.bucketSize"

  private def sideOnly(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet) &&
      e.deterministic

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def bucketOf(e: Expression, size: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(size)))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val crossSideEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (sideOnly(a, left) && sideOnly(b, right)) ||
          (sideOnly(a, right) && sideOnly(b, left))
        case _ => false
      }
      val rangePair =
        if (crossSideEqui) None // already an equi-join; leave it alone
        else findRangePair(conjuncts, left, right)
      rangePair match {
        case Some((point, lo, hi, pointIsLeft)) =>
          val rest = conjuncts.filterNot {
            case GreaterThanOrEqual(a, b) =>
              a.semanticEquals(point) && b.semanticEquals(lo)
            case LessThanOrEqual(a, b) =>
              a.semanticEquals(point) && b.semanticEquals(hi)
            case _ => false
          }
          rewrite(j, point, lo, hi, pointIsLeft, rest)
        case None => j
      }
  }

  /** (point, lo, hi, pointIsLeft) when the condition carries
    * `point BETWEEN lo AND hi` with point and interval on opposite
    * sides.
    */
  private def findRangePair(conjuncts: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    def find(pointSide: LogicalPlan, intervalSide: LogicalPlan)
        : Option[(Expression, Expression, Expression)] = {
      val geqs = conjuncts.collect {
        case GreaterThanOrEqual(p, lo)
            if sideOnly(p, pointSide) && sideOnly(lo, intervalSide) &&
               numeric(p) && numeric(lo) => (p, lo)
      }
      val leqs = conjuncts.collect {
        case LessThanOrEqual(p, hi)
            if sideOnly(p, pointSide) && sideOnly(hi, intervalSide) &&
               numeric(p) && numeric(hi) => (p, hi)
      }
      (for {
        (p, lo) <- geqs
        (p2, hi) <- leqs
        if p.semanticEquals(p2)
      } yield (p, lo, hi)).headOption
    }
    find(left, right).map { case (p, lo, hi) => (p, lo, hi, true) }
      .orElse(find(right, left).map { case (p, lo, hi) => (p, lo, hi, false) })
  }

  private def rewrite(j: Join, point: Expression, lo: Expression,
                      hi: Expression, pointIsLeft: Boolean,
                      rest: Seq[Expression]): LogicalPlan = {
    val size = conf.getConfString(BucketSizeKey, "1000").toDouble
    val (pointSide, intervalSide) = if (pointIsLeft) (j.left, j.right)
                                    else (j.right, j.left)

    val pointBucket = Alias(bucketOf(point, size), "__graft_pb")()
    val pointProj = Project(pointSide.output :+ pointBucket, pointSide)

    // Sequence(lo, hi, step=1) throws at runtime when lo > hi; an inverted
    // (dirty) interval must match nothing — as it does in the pre-rewrite
    // nested-loop plan — not fail the job. A null lo/hi also compares to
    // null here and is dropped, matching the null-safe range predicate.
    val validInterval = Filter(LessThanOrEqual(lo, hi), intervalSide)
    val gen = Explode(Sequence(
      Cast(bucketOf(lo, size), LongType), Cast(bucketOf(hi, size), LongType),
      Some(Literal(1L)),
      // Sequence is TimeZoneAwareExpression: unresolved without a zone,
      // even for numeric sequences
      Some(conf.sessionLocalTimeZone)))
    val genOut = AttributeReference("__graft_ib", LongType, nullable = false)()
    val genNode = Generate(gen, Nil, outer = false, None, Seq(genOut),
                           validInterval)

    val equi = EqualTo(Cast(pointBucket.toAttribute, LongType), genOut)
    val range = And(GreaterThanOrEqual(point, lo), LessThanOrEqual(point, hi))
    val full = (Seq(equi, range) ++ rest).reduce(And)
    val joined =
      if (pointIsLeft) Join(pointProj, genNode, Inner, Some(full), j.hint)
      else Join(genNode, pointProj, Inner, Some(full), j.hint)
    Project(j.output, joined)
  }
}

/** Session extension registration:
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `spark.experimental.extraOptimizations ++= Seq(RewriteRangeJoin)`
  * on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteRangeJoin)
}
