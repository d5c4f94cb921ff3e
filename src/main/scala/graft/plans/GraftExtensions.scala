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
  * Interval-OVERLAP joins (`a.lo <= b.hi AND b.lo <= a.hi`, intervals
  * on BOTH sides) rewrite too: each side explodes its NORMALIZED
  * bucket span (`least(lo,hi)..greatest(lo,hi)` — crash-free on dirty
  * lo > hi rows, and a raw-predicate match always implies the
  * normalized intervals intersect, so no match is lost), the pair is
  * kept only in the one shared bucket holding
  * `greatest(min_left, min_right)` (exact dedup without a distinct),
  * and the original predicates remain as residual filters.
  *
  * Bucket width: `spark.graft.rangeJoin.bucketSize` when set wins;
  * otherwise it is derived from data statistics — the median interval
  * width when the interval side bottoms out in a driver-local relation,
  * or `(max - min) / spark.graft.rangeJoin.targetBuckets` from CBO
  * column stats (ANALYZE TABLE … FOR COLUMNS) — and falls back to
  * 1000. Conjuncts beyond the range pair (e.g. inferred IsNotNull) are
  * preserved. The rule never rematches its own output (the rewrite
  * contains an equi conjunct, which disqualifies the pattern).
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSizeKey = "spark.graft.rangeJoin.bucketSize"
  val TargetBucketsKey = "spark.graft.rangeJoin.targetBuckets"

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
        case None if !crossSideEqui =>
          findOverlapPair(conjuncts, left, right) match {
            case Some((loL, hiL, loR, hiR, used)) =>
              rewriteOverlap(j, loL, hiL, loR, hiR,
                conjuncts.filterNot(c => used.exists(c eq _)))
            case None => j
          }
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

  /** (loL, hiL, loR, hiR, usedConjuncts) when the condition carries the
    * overlap pair `loL <= hiR AND loR <= hiL` with one bound of each
    * side's interval in each conjunct. (Point-in-interval is matched
    * first by [[findRangePair]], so reaching here means both sides
    * contribute a real interval.)
    */
  private def findOverlapPair(conjuncts: Seq[Expression], left: LogicalPlan,
                              right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression,
                Seq[Expression])] = {
    // normalize every cross-side comparison to `small <= big`
    val les = conjuncts.flatMap {
      case c @ LessThanOrEqual(a, b) => Some((a, b, c))
      case c @ GreaterThanOrEqual(a, b) => Some((b, a, c))
      case _ => None
    }
    val lr = les.filter { case (a, b, _) =>
      sideOnly(a, left) && sideOnly(b, right) && numeric(a) && numeric(b) }
    val rl = les.filter { case (a, b, _) =>
      sideOnly(a, right) && sideOnly(b, left) && numeric(a) && numeric(b) }
    (for {
      (loL, hiR, c1) <- lr
      (loR, hiL, c2) <- rl
      if !(c1 eq c2)
    } yield (loL, hiL, loR, hiR, Seq(c1, c2))).headOption
  }

  private def rewrite(j: Join, point: Expression, lo: Expression,
                      hi: Expression, pointIsLeft: Boolean,
                      rest: Seq[Expression]): LogicalPlan = {
    val size = bucketSize(Seq((
      if (pointIsLeft) j.right else j.left, lo, hi)))
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

  /** Interval × interval: explode each side's NORMALIZED bucket span,
    * equi-join the bucket ids, keep each pair only in the bucket of
    * `greatest(min_left, min_right)` (which every intersecting pair of
    * normalized intervals shares, and exactly one copy of), and
    * re-apply the original overlap predicates as residual filters —
    * exact raw-predicate semantics, including dirty lo > hi rows.
    */
  private def rewriteOverlap(j: Join, loL: Expression, hiL: Expression,
                             loR: Expression, hiR: Expression,
                             rest: Seq[Expression]): LogicalPlan = {
    val size = bucketSize(Seq((j.left, loL, hiL), (j.right, loR, hiR)))
    def minOf(lo: Expression, hi: Expression) =
      Least(Seq(Cast(lo, DoubleType), Cast(hi, DoubleType)))
    def maxOf(lo: Expression, hi: Expression) =
      Greatest(Seq(Cast(lo, DoubleType), Cast(hi, DoubleType)))
    def gen(side: LogicalPlan, lo: Expression, hi: Expression, name: String)
        : (Generate, AttributeReference) = {
      val out = AttributeReference(name, LongType, nullable = false)()
      val g = Generate(Explode(Sequence(
        Cast(bucketOf(minOf(lo, hi), size), LongType),
        Cast(bucketOf(maxOf(lo, hi), size), LongType),
        Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
        Nil, outer = false, None, Seq(out), side)
      (g, out)
    }
    val (genL, outL) = gen(j.left, loL, hiL, "__graft_ibl")
    val (genR, outR) = gen(j.right, loR, hiR, "__graft_ibr")
    val equi = EqualTo(outL, outR)
    val dedup = EqualTo(outL, Cast(bucketOf(
      Greatest(Seq(minOf(loL, hiL), minOf(loR, hiR))), size), LongType))
    val overlap = And(LessThanOrEqual(loL, hiR), LessThanOrEqual(loR, hiL))
    val full = (Seq(equi, dedup, overlap) ++ rest).reduce(And)
    Project(j.output, Join(genL, genR, Inner, Some(full), j.hint))
  }

  // ------------------------------------------------------- bucket sizing

  /** Explicit conf wins; otherwise derive from the interval sides'
    * statistics; otherwise 1000.
    */
  private def bucketSize(
      intervals: Seq[(LogicalPlan, Expression, Expression)]): Double = {
    val explicit = conf.getConfString(BucketSizeKey, "")
    if (explicit.nonEmpty) explicit.toDouble
    else {
      val derived = intervals.flatMap { case (p, lo, hi) =>
        derivedBucketSize(p, lo, hi) }
      // widest estimate among the sides: over-wide buckets cost a few
      // extra residual comparisons; under-wide ones multiply the shuffle
      if (derived.nonEmpty) derived.max else 1000.0
    }
  }

  /** Data-derived bucket width for one interval side: the median
    * interval width when the bounds are plain columns of a
    * driver-local relation (floored at span/65536 so degenerate widths
    * can't explode the Generate), else `span / targetBuckets` from CBO
    * column stats when available.
    */
  private[graft] def derivedBucketSize(plan: LogicalPlan, lo: Expression,
                                       hi: Expression): Option[Double] =
    (lo, hi) match {
      case (a: AttributeReference, b: AttributeReference) =>
        localMedianWidth(plan, a, b).orElse(cboSpanWidth(plan, a, b))
      case _ => None
    }

  private def toDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  private def localMedianWidth(plan: LogicalPlan, lo: AttributeReference,
                               hi: AttributeReference): Option[Double] = {
    val local = plan.collectFirst {
      case lr: LocalRelation
          if lr.outputSet.contains(lo) && lr.outputSet.contains(hi) => lr
    }
    local.flatMap { lr =>
      val iLo = lr.output.indexWhere(_.exprId == lo.exprId)
      val iHi = lr.output.indexWhere(_.exprId == hi.exprId)
      val bounds = lr.data.take(65536).flatMap { row =>
        if (row.isNullAt(iLo) || row.isNullAt(iHi)) None
        else for {
          l <- toDouble(row.get(iLo, lo.dataType))
          h <- toDouble(row.get(iHi, hi.dataType))
        } yield (math.min(l, h), math.max(l, h))
      }
      if (bounds.isEmpty) None
      else {
        val widths = bounds.map { case (l, h) => h - l }.sorted
        val median = widths(widths.size / 2)
        val span = bounds.map(_._2).max - bounds.map(_._1).min
        val width = math.max(median, span / 65536.0)
        if (width > 0) Some(width) else None
      }
    }
  }

  private def cboSpanWidth(plan: LogicalPlan, lo: AttributeReference,
                           hi: AttributeReference): Option[Double] = {
    val stats = plan.stats.attributeStats
    for {
      loStat <- stats.get(lo); hiStat <- stats.get(hi)
      min <- loStat.min.flatMap(toDouble)
      max <- hiStat.max.flatMap(toDouble)
      span = max - min if span > 0
    } yield span / conf.getConfString(TargetBucketsKey, "4096").toDouble
  }
}

/** Session extension registration:
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `spark.experimental.extraOptimizations ++= Seq(RewriteRangeJoin)`
  * on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteRangeJoin)
    GraftFunctions.registry.foreach { case (name, (info, builder)) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
  }
}

/** The native expressions as SQL functions — `spark.sql` users get the
  * same codegen'd sketches/stats the Column API uses, e.g.
  * `SELECT graft_simhash64(split(text, ' ')) FROM docs`. Tuning
  * parameters (k, bands, n, form…) must be literals: they configure
  * the expression at plan time, exactly like the Column API's Scala
  * arguments.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def lit(e: Expression, fn: String, arg: String): Any = e match {
    case Literal(v, _) if v != null => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be a non-null literal, got $e")
  }
  private def intLit(e: Expression, fn: String, arg: String): Int =
    lit(e, fn, arg) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$fn: $arg is out of integer range: $l")
      case o => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $o")
    }
  private def strLit(e: Expression, fn: String, arg: String): String =
    lit(e, fn, arg).toString

  /** Literal array-of-strings argument: accepts both a foldable
    * `array('a','b')` (CreateArray of literals — constant-folded or
    * not) and an already-folded array Literal. */
  private def strArrayLit(e: Expression, fn: String, arg: String): Seq[String] =
    e match {
      case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
        a.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(String.valueOf).toSeq
      case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
          if ca.children.forall(_.isInstanceOf[Literal]) =>
        ca.children.map(c => String.valueOf(lit(c, fn, arg)))
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal array of strings, got $e")
    }

  private def longArrayLit(e: Expression, fn: String, arg: String): Seq[Long] =
    e match {
      case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
        a.toObjectArray(org.apache.spark.sql.types.LongType)
          .map { case l: java.lang.Long => l.longValue() }.toSeq
      case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
          if ca.children.forall(_.isInstanceOf[Literal]) =>
        ca.children.map(c => lit(c, fn, arg) match {
          case i: Int => i.toLong
          case l: Long => l
          case o => throw new IllegalArgumentException(
            s"$fn: $arg must contain integer literals, got $o")
        })
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal array of longs, got $e")
    }

  private def doubleArrayLit(e: Expression, fn: String, arg: String): Seq[Double] =
    e match {
      case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
        a.toObjectArray(org.apache.spark.sql.types.DoubleType)
          .map { case d: java.lang.Double => d.doubleValue() }.toSeq
      case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
          if ca.children.forall(_.isInstanceOf[Literal]) =>
        ca.children.map(c => lit(c, fn, arg) match {
          case d: Double => d
          case i: Int => i.toDouble
          case l: Long => l.toDouble
          // a bare SQL `0.5` parses as DECIMAL(1,1), not DOUBLE
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case o => throw new IllegalArgumentException(
            s"$fn: $arg must contain numeric literals, got $o")
        })
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal array of doubles, got $e")
    }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Registry entry with a STRICT arity check — the registry builder
    * signature accepts any Seq, so without this an extra argument
    * would be silently ignored (wrong results the user asked to
    * configure) and a missing one would die as a bare
    * IndexOutOfBounds.
    */
  private def fn(name: String, arity: Int, usage: String)(
      build: Seq[Expression] => Expression)
      : (String, (ExpressionInfo, Seq[Expression] => Expression)) =
    name -> (info(name, usage), (args: Seq[Expression]) => {
      if (args.length != arity) throw new IllegalArgumentException(
        s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    })

  val registry: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    fn("graft_simhash64", 1, "_FUNC_(tokens) - 64-bit SimHash of a token array")(
      args => graft.functions.SimHash64Expr(args.head)),
    fn("graft_shingles", 2, "_FUNC_(tokens, n) - distinct word n-gram shingles")(
      args => graft.functions.ShinglesExpr(args(0),
        intLit(args(1), "graft_shingles", "n"))),
    fn("graft_minhash_bands", 3, "_FUNC_(shingles, k, bands) - LSH band bucket keys")(
      args => graft.functions.MinHashBandsExpr(args(0),
        intLit(args(1), "graft_minhash_bands", "k"),
        intLit(args(2), "graft_minhash_bands", "bands"))),
    fn("graft_rolling_hash", 1, "_FUNC_(text) - polynomial rolling-hash fingerprint")(
      args => graft.functions.RollingHashExpr(args.head, 31L, 1000000007L)),
    fn("graft_repetition_stats", 1,
       "_FUNC_(tokens) - [distinct_token_ratio, top_bigram_frac, dup_trigram_frac]")(
      args => graft.functions.RepetitionStatsExpr(args.head)),
    fn("graft_normalize_unicode", 2, "_FUNC_(text, form) - Unicode NFC/NFD/NFKC/NFKD")(
      args => graft.functions.NormalizeUnicodeExpr(args(0),
        strLit(args(1), "graft_normalize_unicode", "form"))),
    fn("graft_cosine", 2, "_FUNC_(a, b) - cosine similarity of two float/double arrays")(
      args => graft.functions.CosineSimExpr(args(0), args(1))),
    fn("graft_trim_punctuation", 1,
       "_FUNC_(text) - fixpoint trailing-punctuation trim")(
      args => graft.marc.TrimPunctuation(args.head)),
    fn("graft_approx_top", 2,
       "_FUNC_(col, capacity) - Misra-Gries heavy-hitter sketch aggregate")(
      // AggregateFunctions are returned bare; the analyzer wraps them
      // into an AggregateExpression during resolution
      args => graft.functions.MisraGriesAgg(args(0),
        intLit(args(1), "graft_approx_top", "capacity"))),
    fn("graft_char_entropy", 1,
       "_FUNC_(text) - [n_chars, entropy_micro] code-point entropy")(
      args => graft.functions.CharEntropyExpr(args.head)),
    fn("graft_multi_match", 2,
       "_FUNC_(text, patterns) - distinct blocklist patterns occurring in text")(
      args => graft.functions.MultiMatchExpr(args(0),
        strArrayLit(args(1), "graft_multi_match", "patterns"))),
    fn("graft_bpe_encode", 2,
       "_FUNC_(text, merges) - BPE subword tokens; merges is a literal array " +
       "of 'left right' pair strings in rank order (index = merge rank)")(
      args => graft.functions.BpeEncodeExpr(args(0),
        strArrayLit(args(1), "graft_bpe_encode", "merges").zipWithIndex.map {
          case (m, rank) => m.split(" ", 2) match {
            case Array(l, r) if l.nonEmpty && r.nonEmpty => (l, r, rank)
            case _ => throw new IllegalArgumentException(
              s"graft_bpe_encode: merges entries must be 'left right' pairs, got '$m'")
          }
        })),
    fn("graft_unigram_encode", 4,
       "_FUNC_(text, pieces, scores_micro, max_piece_len) - unigram-LM Viterbi " +
       "pieces; pieces/scores_micro are parallel literal arrays")(
      args => {
        val pieces = strArrayLit(args(1), "graft_unigram_encode", "pieces")
        val scores = longArrayLit(args(2), "graft_unigram_encode", "scores_micro")
        if (pieces.length != scores.length) throw new IllegalArgumentException(
          s"graft_unigram_encode: pieces (${pieces.length}) and scores_micro " +
          s"(${scores.length}) must be the same length")
        graft.functions.UnigramEncodeExpr(args(0), pieces.zip(scores),
          intLit(args(3), "graft_unigram_encode", "max_piece_len"))
      }),
    fn("graft_quantile_sketch", 3,
       "_FUNC_(col, k, phis) - mergeable deterministic KLL quantile sketch " +
       "over a LONG column; struct(n, err_bound, qs)")(
      args => graft.functions.KllQuantilesAgg(args(0),
        intLit(args(1), "graft_quantile_sketch", "k"),
        doubleArrayLit(args(2), "graft_quantile_sketch", "phis"))),
    fn("graft_kll_merge", 3,
       "_FUNC_(sketch, k, phis) - merge KLL sketch wire bytes (the persisted " +
       "quantile store's read half); struct(n, err_bound, qs)")(
      args => graft.functions.KllMergeAgg(args(0),
        intLit(args(1), "graft_kll_merge", "k"),
        doubleArrayLit(args(2), "graft_kll_merge", "phis"))),
    fn("graft_kmv_sketch", 2,
       "_FUNC_(col, k) - KMV theta distinct-count sketch aggregate; " +
       "array<long> of the k smallest distinct value hashes")(
      args => graft.functions.KmvSketchAgg(args(0),
        intLit(args(1), "graft_kmv_sketch", "k"))),
    fn("graft_kmv_merge", 2,
       "_FUNC_(sketch, k) - merge KMV sketch arrays (the persisted " +
       "distinct store's read half); struct(n_distinct, is_exact)")(
      args => graft.functions.KmvMergeAgg(args(0),
        intLit(args(1), "graft_kmv_merge", "k"))),
    fn("graft_hll_sketch", 2,
       "_FUNC_(col, p) - HyperLogLog register aggregate (m = 2^p); " +
       "array<long> of max first-one positions, elementwise-max mergeable")(
      args => graft.functions.HllSketchAgg(args(0),
        intLit(args(1), "graft_hll_sketch", "p"))),
    fn("graft_hll_merge", 2,
       "_FUNC_(registers, p) - merge HLL register arrays (elementwise max)")(
      args => graft.functions.HllMergeAgg(args(0),
        intLit(args(1), "graft_hll_merge", "p"))),
    fn("graft_zorder", 3,
       "_FUNC_(x, y, bits) - Morton/Z-order interleave of two non-negative " +
       "integer columns over the low `bits` bits of each")(
      args => {
        // built directly in Catalyst (the Column API's lazy ColumnNodes
        // cannot be embedded inside an already-resolving SQL plan); the
        // node shape matches Layout.zorderValue exactly — parity is
        // spec-asserted in SqlFunctionsSpec
        val bits = intLit(args(2), "graft_zorder", "bits")
        if (bits < 1 || bits > 31) throw new IllegalArgumentException(
          s"graft_zorder: bits must be in [1,31], got $bits")
        def long(e: Expression) = Cast(e, LongType)
        val xl = long(args(0)); val yl = long(args(1))
        (0 until bits).map { i =>
          Add(
            ShiftLeft(BitwiseAnd(ShiftRightUnsigned(xl, Literal(i)),
              Literal(1L)), Literal(2 * i)),
            ShiftLeft(BitwiseAnd(ShiftRightUnsigned(yl, Literal(i)),
              Literal(1L)), Literal(2 * i + 1)))
        }.reduce[Expression]((a, b) => Add(a, b))
      }),

    fn("graft_bloom_bits", 3,
       "_FUNC_(value, m_bits, k) - the k Bloom bit positions of a string " +
       "value under seed-free double hashing (Layout.bloomBits parity)")(
      args => {
        val m = intLit(args(1), "graft_bloom_bits", "m_bits")
        val k = intLit(args(2), "graft_bloom_bits", "k")
        if (m < 2) throw new IllegalArgumentException(
          s"graft_bloom_bits: m_bits must be > 1, got $m")
        if (k < 1 || k > 64) throw new IllegalArgumentException(
          s"graft_bloom_bits: k must be in [1,64], got $k")
        val h1 = graft.functions.RollingHashExpr(args.head, 31L, 1000000007L)
        val h2 = graft.functions.RollingHashExpr(args.head, 131L, 1000000009L)
        CreateArray((0 until k).map { i =>
          Pmod(Add(h1, Multiply(Literal(i.toLong),
            Add(h2, Literal(1L)))), Literal(m.toLong))
        })
      }))
}
