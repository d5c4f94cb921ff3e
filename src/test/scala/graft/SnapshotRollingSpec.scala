package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}

/** Specs for the round-5 trio: trailing-window rolling features,
  * snapshot CDC diff, and contrastive hard-negative mining — each
  * against a hand-checked fixture exercising the edge the operator's
  * contract promises (RANGE peers, null-safe compare, label pruning).
  */
class SnapshotRollingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- rollingStats ------------------------------------------------------

  test("rollingStats: trailing window counts, RANGE peers, key isolation") {
    // key 1: ts 0,5,10,27 with span 10 — window(27) sees only itself
    // (17..27); window(10) sees 0,5,10. Same-instant peers at ts 5
    // (two rows) must BOTH appear in each other's frame (RANGE, not
    // ROWS): each of the ts-5 rows counts 0,5,5 → n=3.
    val df = Seq(
      (1L, 100L, 0L, 1.0), (1L, 101L, 5L, 2.0), (1L, 102L, 5L, 4.0),
      (1L, 103L, 10L, 8.0), (1L, 104L, 27L, 16.0),
      (2L, 200L, 5L, 100.0))
      .toDF("user_id", "event_id", "ts_us", "value")
    val out = Relational.rollingStats(df, Seq("user_id"), "ts_us", "value",
        windowSpan = 10L)
      .select("user_id", "event_id", "n_window", "value_milli_window")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 1L, 1000L),          // ts 0: alone
      (1L, 101L, 3L, 7000L),          // ts 5: 0,5,5 (peer included)
      (1L, 102L, 3L, 7000L),          // identical frame for the peer
      (1L, 103L, 4L, 15000L),         // ts 10: 0,5,5,10
      (1L, 104L, 1L, 16000L),         // ts 27: span 10 reaches back to 17
      (2L, 200L, 1L, 100000L)))       // other key never leaks in
  }

  test("rollingStats equals the O(n·w) self-join reference on seeded data") {
    // seeded frame with colliding timestamps and multiple keys
    val df = spark.range(500).select(
      (col("id") % 7).as("k"), col("id").as("event_id"),
      ((col("id") * 37) % 97).as("t"),
      ((col("id") % 13) - 6).cast("double").as("v"))
    val got = Relational.rollingStats(df, Seq("k"), "t", "v", windowSpan = 10L)
      .select("k", "event_id", "n_window", "value_milli_window")
      .collect().map(_.toSeq).toSet
    // brute-force twin: per row, join back every same-key row in range
    val l = df.select(col("k"), col("event_id"), col("t"))
    val r = df.select(col("k"), col("t").as("t2"),
      round(col("v") * 1000).cast("long").as("vm"))
    val want = l.join(r, "k")
      .filter(col("t2").between(col("t") - 10L, col("t")))
      .groupBy("k", "event_id")
      .agg(count(lit(1)).as("n_window"), sum("vm").as("value_milli_window"))
      .select("k", "event_id", "n_window", "value_milli_window")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  // --- snapshotDiff ------------------------------------------------------

  test("snapshotDiff: added/removed/changed classification, null-safe") {
    val oldSnap = Seq(
      (1L, Some("A"), Some(10.0)),    // unchanged → dropped
      (2L, Some("B"), Some(20.0)),    // status changes
      (3L, None, Some(30.0)),         // null==null → unchanged → dropped
      (4L, Some("D"), Some(40.0)),    // removed
      (6L, Some("F"), None))          // null → value appears = changed
      .toDF("k", "status", "price")
    val newSnap = Seq(
      (1L, Some("A"), Some(10.0)),
      (2L, Some("X"), Some(20.0)),
      (3L, None, Some(30.0)),
      (5L, Some("E"), Some(50.0)),    // added
      (6L, Some("F"), Some(60.0)))
      .toDF("k", "status", "price")
    val out = Relational.snapshotDiff(oldSnap, newSnap, Seq("k"),
        Seq("status", "price"))
      .select("k", "change_type").as[(Long, String)].collect().toSet
    assert(out == Set(
      (2L, "changed"), (4L, "removed"), (5L, "added"), (6L, "changed")))
  }

  test("applySnapshotDiff round trip: apply(old, diff(old,new)) == new") {
    // seeded deterministic churn over a 200-key snapshot: drops,
    // restatements, inserts, null flips — the full diff surface
    val oldSnap = spark.range(200).select(col("id").as("k"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 5)
        .cast("long").as("a"),
      (col("id") % 3).cast("double").as("b"))
    val newSnap = spark.range(30, 230).select(col("id").as("k"),
      when(col("id") % 11 === 0, lit(null)).otherwise(col("id") % 4)
        .cast("long").as("a"),
      (col("id") % 6).cast("double").as("b"))
    val diff = Relational.snapshotDiff(oldSnap, newSnap, Seq("k"),
      Seq("a", "b"))
    val rebuilt = Relational.applySnapshotDiff(oldSnap, diff, Seq("k"),
        Seq("a", "b"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val want = newSnap.orderBy("k").collect().map(_.toSeq).toSeq
    assert(rebuilt == want)
  }

  test("snapshotDiff carries old/new values of every compared column") {
    val o = Seq((2L, "B", 20.0)).toDF("k", "status", "price")
    val n = Seq((2L, "X", 20.0)).toDF("k", "status", "price")
    val row = Relational.snapshotDiff(o, n, Seq("k"), Seq("status", "price"))
      .select("k", "old_status", "new_status", "old_price", "new_price")
      .as[(Long, String, String, Double, Double)].head()
    assert(row == ((2L, "B", "X", 20.0, 20.0)))
  }

  // --- qualityReport -----------------------------------------------------

  test("qualityReport: every check fires on planted violations") {
    val facts = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(1L), Some(-5.0), Some("X")),   // dup key, negative, bad status
      (None, Some(3.0), Some("F")),        // null key
      (Some(9L), None, None))              // null value/status, orphan ref
      .toDF("k", "v", "status")
    val dim = Seq(1L).toDF("dk")
    val out = Relational.qualityReport(facts,
        notNull = Seq("k", "v"),
        nonNegative = Seq("v"),
        inSet = Map("status" -> Seq("O", "F")),
        uniqueKey = Seq("k"),
        refs = Seq(("k", dim, "dk")))
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "not_null:k" -> 1L,
      "not_null:v" -> 1L,
      "non_negative:v" -> 1L,
      "in_set:status" -> 1L,   // null status NOT counted here
      "unique:k" -> 1L,        // one surplus row for k=1
      "ref:k->dk" -> 1L))      // k=9 orphan; null k not counted
  }

  test("qualityReport: clean table reports all zeros") {
    val facts = Seq((1L, 1.0, "O"), (2L, 2.0, "F")).toDF("k", "v", "status")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = Relational.qualityReport(facts, Seq("k"), Seq("v"),
        Map("status" -> Seq("O", "F")), Seq("k"), Seq(("k", dim, "dk")))
      .as[(String, Long)].collect()
    assert(out.length == 5 && out.forall(_._2 == 0L))
  }

  // --- hardNegatives -----------------------------------------------------

  test("hardNegatives: top-k nearest different-label vectors only") {
    // label 0: ids 1,2 near each other; label 1: ids 3,4; the nearest
    // DIFFERENT-label vector to id 1 is 3 (cos≈0.8), then 4. Same-label
    // id 2 (cos≈1.0) must NOT appear — nor the query itself.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f), 0),
      (3L, Array(0.8f, 0.6f), 1),
      (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 1L),
        "vec_id", "embedding", "label", k = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 3L, 1L), (1L, 4L, 2L)))
  }

  test("annBruteForceBlocked is row-identical to the join formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .repartition(7) // deliberately odd layout: partials must merge exactly
    val joinBased = Similarity.annBruteForce(emb, emb, "vec_id", "embedding",
      k = 5).collect().map(_.toSeq).toSet
    val blocked = Similarity.annBruteForceBlocked(emb, emb, "vec_id",
      "embedding", k = 5).collect().map(_.toSeq).toSet
    assert(blocked == joinBased)
    assert(blocked.nonEmpty)
  }

  test("mmrSelect: diversity beats redundancy; plain top-k would not") {
    // 3-D on purpose: ids 1,2 are near-duplicates at +azimuth from the
    // query, id 3 sits at the SAME polar angle (equal relevance) but
    // opposite azimuth (low similarity to 1/2). Plain top-2 picks the
    // near-dup pair {2,1}; MMR must pick 2 then 3 — the redundancy
    // penalty, not relevance, decides the second slot.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.436f, 0.0f)),
      (2L, Array(0.9f, 0.430f, 0.0f)),
      (3L, Array(0.9f, -0.436f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(emb, "vec_id", "embedding",
        queryId = 0L, k = 2, lambdaPermille = 900L)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(2L, 3L), out.toString)
    // and the selection is partition-layout independent
    val re = Similarity.mmrSelect(emb.repartition(4), "vec_id",
        "embedding", queryId = 0L, k = 2, lambdaPermille = 900L)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(re == out)
  }

  test("mmrSelect k=64: matches driver greedy reference, layout-invariant, flat plan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.operators.MmrDebug.maxPoolPlanNodes = 0
    val out = Similarity.mmrSelect(emb, "vec_id", "embedding",
        queryId = 0L, k = 64, lambdaPermille = 700L)
      .select("rank", "vec_id", "score_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 64)
    // the per-round pool plan is (project ∘ filter ∘ LogicalRDD) at
    // EVERY round — the running-__pen + localCheckpoint design; the
    // old formulation grew O(k) cosine columns + an O(k) isin literal
    assert(graft.operators.MmrDebug.maxPoolPlanNodes <= 8,
      s"pool plan grew to ${graft.operators.MmrDebug.maxPoolPlanNodes} nodes")
    // layout invariance at the same k
    val re = Similarity.mmrSelect(emb.repartition(13), "vec_id", "embedding",
        queryId = 0L, k = 64, lambdaPermille = 700L)
      .select("rank", "vec_id", "score_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(re == out)
    // driver-side greedy reference under the exact integer discipline
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val qv = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      var na = 0.0; i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      var nb = 0.0; i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def micro(c: Double): Long = java.math.BigDecimal.valueOf(c * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    var pool = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, micro(cos(v, qv)), 0L) } // id, v, rel, pen
    val ref = Seq.newBuilder[(Long, Long, Long)]
    var rank = 1L
    while (rank <= 64 && pool.nonEmpty) {
      val best = pool
        .map { case (id, v, rel, pen) => (id, v, rel - (700L * pen) / 1000L) }
        .minBy { case (id, _, score) => (-score, id) }
      ref += ((rank, best._1, best._3))
      pool = pool.filter(_._1 != best._1).map { case (id, v, rel, pen) =>
        (id, v, rel, math.max(pen, micro(cos(v, best._2))))
      }
      rank += 1
    }
    assert(out == ref.result())
  }

  test("mmrSelect: pool smaller than k returns the whole pool, in MMR order") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.5f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(emb, "vec_id", "embedding",
        queryId = 0L, k = 10, lambdaPermille = 500L)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out.size == 3)
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("hardNegatives matches brute-force with same-label pairs removed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val got = Similarity.hardNegatives(emb, q, "vec_id", "embedding",
      "label", k = 3)
    // independent re-derivation: score all cross-label pairs directly
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"),
                       col("label").as("cl"))
    val qq = q.select(col("vec_id").as("qid"), col("embedding").as("qv"),
                      col("label").as("ql"))
    val scored = c.crossJoin(qq).filter(col("ql") =!= col("cl"))
      .select(col("qid"), col("nid"),
              round(Similarity.cosine(col("qv"), col("cv")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    val want = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("nid"), col("rk").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val gotSet = got.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotSet == want)
  }

  // --- bitextMine --------------------------------------------------------

  test("bitextMine ≡ plain-Scala margin twin; margin argmax can differ " +
       "from raw-cosine argmax; threshold drops sub-margin sources") {
    def n4(v: (Double, Double, Double, Double)): Array[Float] = {
      val m = math.sqrt(v._1 * v._1 + v._2 * v._2 + v._3 * v._3 + v._4 * v._4)
      Array((v._1 / m).toFloat, (v._2 / m).toFloat,
            (v._3 / m).toFloat, (v._4 / m).toFloat)
    }
    // even ids = sources, odd = targets; t3 is the near-mean "hub"
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> n4((1, 0, 0, 0)), 2L -> n4((0.92, 0.39, 0, 0)),
      4L -> n4((0.39, 0.92, 0, 0)), 6L -> n4((0, 1, 0, 0)),
      1L -> n4((0.995, -0.0998, 0, 0)),
      3L -> n4((0.6715, 0.6715, 0, 0)),   // hub ≈ normalized source mean
      5L -> n4((0.05, 0.999, 0, 0)), 7L -> n4((0, 0, 1, 0)))
    val df = vecs.toDF("vec_id", "embedding")
    val k = 2
    val got = Similarity.bitextMine(df.filter(col("vec_id") % 2 === 0),
        df.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        k = k, minMarginPermille = 1000L)
      .select(col("src_id"), col("tgt_id"), col("margin_permille"))
      .as[(Long, Long, Long)].collect().toSet
    // plain-Scala twin: same cosine formula (sequential fold,
    // float→double), same 6-digit rounding, same integer margin
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def micro(c: Double): Long = math.round(c * 1e6)
    val srcs = vecs.filter(_._1 % 2 == 0).toMap
    val tgts = vecs.filter(_._1 % 2 == 1).toMap
    def knn(q: Array[Float], pool: Map[Long, Array[Float]]) =
      pool.toSeq.map { case (id, v) => (cos6(q, v), id) }
        .sortBy { case (c, id) => (-c, id) }.take(k)
    val sumS = srcs.map { case (id, v) =>
      id -> knn(v, tgts).map(p => micro(p._1)).sum }
    val sumT = tgts.map { case (id, v) =>
      id -> knn(v, srcs).map(p => micro(p._1)).sum }
    val want = srcs.flatMap { case (sid, sv) =>
      val cands = knn(sv, tgts).map { case (c, tid) =>
        (micro(c) * 2 * k * 1000 / (sumS(sid) + sumT(tid)), tid)
      }.sortBy { case (m, tid) => (-m, tid) }
      cands.headOption.filter(_._1 >= 1000L).map(m => (sid, m._2, m._1))
    }.toSet
    assert(got == want)
    // fixture sanity: for at least one source, the margin winner is
    // NOT the raw-cosine winner (the hub demotion the margin exists
    // for), and at least one source fails the threshold entirely
    val rawBest = srcs.map { case (sid, sv) => sid -> knn(sv, tgts).head._2 }
    val marginBest = want.map(r => r._1 -> r._2).toMap
    assert(marginBest.exists { case (sid, tid) => rawBest(sid) != tid } ||
           srcs.keySet.diff(marginBest.keySet).nonEmpty)
    assert(srcs.keySet.diff(marginBest.keySet).nonEmpty,
      "expected at least one source below the margin threshold")
  }

  test("bitextMineAnn: full-probe IVF ≡ exact miner; calibrated rate " +
       "mines the top margin slice; partial-probe recall floor on " +
       "planted pairs") {
    import graft.operators.Similarity
    val dim = 64; val nPairs = 40
    // planted pair i: src = e_i, tgt = normalize(e_i + eps_i·e_{i+1})
    // with eps varying by class so margins differ across pairs
    def unit(i: Int, eps: Double): Array[Float] = {
      val v = Array.fill(dim)(0.0)
      v(i % dim) = 1.0; v((i + 1) % dim) += eps
      val m = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / m).toFloat)
    }
    val vecs = (0 until nPairs).flatMap { i =>
      Seq(((2 * i).toLong, unit(i, 0.0)),
          ((2 * i + 1).toLong, unit(i, 0.01 * (1 + i % 5))))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val s = df.filter(col("vec_id") % 2 === 0)
    val t = df.filter(col("vec_id") % 2 === 1)
    val twins = (0 until nPairs)
      .map(i => ((2 * i).toLong, (2 * i + 1).toLong)).toSet
    val exact = Similarity.bitextMine(s, t, "vec_id", "embedding",
        k = 3, minMarginPermille = 0L)
      .select("src_id", "tgt_id", "margin_permille")
      .as[(Long, Long, Long)].collect().toSet
    // full probe (nprobe ≥ #cells) + rate 1000 (keep every best pair):
    // IVF plumbing with exact recall ⇒ identical to the exact miner
    val full = Similarity.bitextMineAnn(s, t, "vec_id", "embedding",
        k = 3, ratePermille = 1000L, nprobe = 40, lloydIters = 2)
      .select("src_id", "tgt_id", "margin_permille")
      .as[(Long, Long, Long)].collect().toSet
    assert(full == exact)
    assert(exact.map(r => (r._1, r._2)) == twins) // every best is the twin
    // calibrated mining rate: top 100‰ of 40 best pairs → target 4,
    // ties included — a strict top slice, never zero, never everything
    val sliced = Similarity.bitextMineAnn(s, t, "vec_id", "embedding",
        k = 3, ratePermille = 100L, nprobe = 40, lloydIters = 2)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(sliced.nonEmpty && sliced.size >= 4 && sliced.size < nPairs)
    assert(sliced.subsetOf(twins))
    // partial probe: margins fold in the index's recall loss — pin a
    // floor on planted-pair recovery (the mutual_knn composition
    // contract)
    val partial = Similarity.bitextMineAnn(s, t, "vec_id", "embedding",
        k = 3, ratePermille = 1000L, nprobe = 2, lloydIters = 2)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(partial.intersect(twins).size >= (nPairs * 3) / 4,
      s"partial-probe recall too low: ${partial.intersect(twins).size}/$nPairs")
  }

  // --- joinMaintain ------------------------------------------------------

  test("joinMaintain: every churn class lands where the algebra says") {
    // fact (key, fk, v): 1 untouched, 2 value-changed, 3 deleted,
    // 4 fk-REPOINTED 20→21, 5 references dim row that changes,
    // 6 references dim row that is deleted (must orphan out),
    // 7 inserted referencing a dim row INSERTED in the same batch
    val aOld = Seq((1L, 20L, "a"), (2L, 20L, "b"), (3L, 21L, "c"),
                   (4L, 20L, "d"), (5L, 22L, "e"), (6L, 23L, "f"))
      .toDF("k", "fk", "v")
    val aNew = Seq((1L, 20L, "a"), (2L, 20L, "B"), (4L, 21L, "d"),
                   (5L, 22L, "e"), (6L, 23L, "f"), (7L, 24L, "g"))
      .toDF("k", "fk", "v")
    val bOld = Seq((20L, "x"), (21L, "y"), (22L, "z"), (23L, "w"))
      .toDF("bk", "seg")
    val bNew = Seq((20L, "x"), (21L, "y"), (22L, "Z"), (24L, "n"))
      .toDF("bk", "seg")
    val dA = Relational.snapshotDiff(aOld, aNew, Seq("k"), Seq("fk", "v"))
    val dB = Relational.snapshotDiff(bOld, bNew, Seq("bk"), Seq("seg"))
    val viewOld = aOld.join(bOld, aOld("fk") === bOld("bk"))
      .select(col("k"), col("fk"), col("v"), col("seg"))
    val got = Relational.joinMaintain(viewOld, aOld, dA, bOld, dB,
        "k", "fk", "bk", Seq("fk", "v"), Seq("seg"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, 20L, "a", "x"),   // untouched both sides
      (2L, 20L, "B", "x"),   // fact value change
      (4L, 21L, "d", "y"),   // repointed fk joins the NEW target
      (5L, 22L, "e", "Z"),   // dim change fans out to its facts
      (7L, 24L, "g", "n")))  // same-batch fact+dim insert pair joins
    // 3 (fact delete) and 6 (dim delete orphan) are gone
  }

  test("joinMaintain ≡ full recompute on seeded churn (property)") {
    val aOld = spark.range(1, 400).select(col("id").as("k"),
      (col("id") % 37).as("fk"),
      concat(lit("v"), (col("id") % 11)).as("v"))
    val aNew = aOld.filter(col("k") % 13 =!= 0)
      .withColumn("fk", when(col("k") % 7 === 0, (col("fk") + 5) % 37)
        .otherwise(col("fk")))
      .withColumn("v", when(col("k") % 5 === 0, lit("CH")).otherwise(col("v")))
      .unionByName(aOld.filter(col("k") % 17 === 0)
        .select((col("k") + 1000L).as("k"), col("fk"), lit("NEW").as("v")))
    val bOld = spark.range(0, 37).select(col("id").as("bk"),
      concat(lit("s"), col("id") % 4).as("seg"))
    val bNew = bOld.filter(col("bk") % 11 =!= 3)
      .withColumn("seg", when(col("bk") % 6 === 1, lit("UP"))
        .otherwise(col("seg")))
    val dA = Relational.snapshotDiff(aOld, aNew, Seq("k"), Seq("fk", "v"))
    val dB = Relational.snapshotDiff(bOld, bNew, Seq("bk"), Seq("seg"))
    val viewOld = aOld.join(bOld, aOld("fk") === bOld("bk"))
      .select(col("k"), col("fk"), col("v"), col("seg"))
    val got = Relational.joinMaintain(viewOld, aOld, dA, bOld, dB,
        "k", "fk", "bk", Seq("fk", "v"), Seq("seg"))
      .as[(Long, Long, String, String)].collect().toSet
    val want = aNew.join(bNew, aNew("fk") === bNew("bk"))
      .select(col("k"), col("fk"), col("v"), col("seg"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  // --- fkProfile ---------------------------------------------------------

  test("fkProfile: containment/orphan arithmetic, null and duplicate " +
       "hygiene, non-FK overlap stays partial") {
    val child = Seq[java.lang.Long](1L, 1L, 2L, 3L, null, 9L)
      .toDF("ck")
    val parent = Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L, null)
      .toDF("pk")
    val got = Relational.fkProfile(Seq((child, "ck", parent, "pk", "c->p")))
      .as[(String, Long, Long, Long, Long)].head()
    // child distinct non-null {1,2,3,9}: 3 of 4 inside parent {1..5}
    assert(got == (("c->p", 4L, 5L, 3L, 750L)))
    val full = Relational.fkProfile(Seq(
      (child.filter(col("ck") =!= 9L), "ck", parent, "pk", "fk")))
      .as[(String, Long, Long, Long, Long)].head()
    assert(full == (("fk", 3L, 5L, 3L, 1000L)))
  }

  // --- partitionGaps -----------------------------------------------------

  test("partitionGaps: runs coalesce to one row, edges are exclusive, " +
       "duplicate presence rows are hygiene-deduped") {
    // key A present: 0,1,4,5,9 (dup 5) -> gaps [2,3] and [6,8]
    // key B present: 3 only -> no gap (nothing between first and last)
    val present = Seq(("A", 0L), ("A", 1L), ("A", 4L), ("A", 5L),
      ("A", 5L), ("A", 9L), ("B", 3L)).toDF("k", "day")
    val got = Relational.partitionGaps(present, Seq("k"), "day")
      .orderBy("k", "gap_start")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 2L, 3L, 2L), ("A", 6L, 8L, 3L)))
  }

  // --- clipOutliers ------------------------------------------------------

  test("clipOutliers: exact order-statistic thresholds, clip counts, " +
       "clipped sum arithmetic") {
    // stratum A: 1..20 (milli 1000..20000); P5 = first v with
    // cum*100 >= 5*20 (cum >= 1) -> 1000; P95: cum >= 19 -> 19000.
    // So only 20 clips high (20000 -> 19000): sum drops by 1000.
    val df = (1 to 20).map(i => ("A", i.toDouble)).toDF("s", "v")
    val got = Relational.clipOutliers(df, "s", "v", 5, 95)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == (("A", 1000L, 19000L, 20L, 0L, 1L, 210000L, 209000L)))
    // heavy duplicate mass: 10x value 5, one 100 -> P95 threshold is
    // 100 itself only when cum crosses at it; with n=11, 95*n/100 =
    // 10.45 -> cum(5)=10 < 10.45, cum(100)=11 -> hi = 100000, nothing
    // clips; lo: 5*11/100 = 0.55 -> cum(5)=10 >= 0.55*... lo = 5000
    val dup = (Seq.fill(10)(5.0) :+ 100.0).map(("B", _)).toDF("s", "v")
    val g2 = Relational.clipOutliers(dup, "s", "v", 5, 95)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(g2 == (("B", 5000L, 100000L, 11L, 0L, 0L, 150000L, 150000L)))
  }

  // --- benfordCheck ------------------------------------------------------

  test("benfordCheck: digit extraction, permilles, expected constants, " +
       "sub-1 values excluded") {
    // 10 values: digit 1 x5 (1, 10, 150, 1.2->1, 19), digit 2 x3,
    // digit 9 x2; 0.4 rounds to 0 -> excluded
    val df = Seq(1.0, 10.0, 150.0, 1.2, 19.0, 2.0, 25.0, 200.0,
      9.0, 90.0, 0.4).map(("A", _)).toDF("s", "v")
    val got = Relational.benfordCheck(df, "s", "v")
      .orderBy("digit")
      .select("digit", "n", "obs_permille", "benford_permille",
        "dev_permille")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1", 5L, 500L, 301L, 199L),
      ("2", 3L, 300L, 176L, 124L),
      ("9", 2L, 200L, 46L, 154L)))
  }

  // --- equiDepthHistogram ------------------------------------------------

  test("equiDepthHistogram: equal-depth bins, whole-value assignment, " +
       "heavy value owns its bin") {
    // 8 distinct values 1..8, one row each, k=4 -> bins of exactly 2
    val even = (1 to 8).map(i => ("A", i.toDouble)).toDF("s", "v")
    val g1 = Relational.equiDepthHistogram(even, "s", "v", 4)
      .orderBy("bin")
      .select("bin", "lo_milli", "hi_milli", "n_rows", "n_distinct")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g1 == Seq((0L, 1000L, 2000L, 2L, 2L), (1L, 3000L, 4000L, 2L, 2L),
      (2L, 5000L, 6000L, 2L, 2L), (3L, 7000L, 8000L, 2L, 2L)))
    // heavy value: 10x value 5 + values 1,9; k=3, n=12.
    // exclusive prefixes: 1->0 (bin 0), 5->1 (bin 0), 9->11 (bin 2):
    // value 5's 10 rows stay WHOLE in bin 0; bin 1 is simply absent
    val heavy = (Seq(1.0, 9.0) ++ Seq.fill(10)(5.0)).map(("B", _))
      .toDF("s", "v")
    val g2 = Relational.equiDepthHistogram(heavy, "s", "v", 3)
      .orderBy("bin")
      .select("bin", "lo_milli", "hi_milli", "n_rows", "n_distinct")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq((0L, 1000L, 5000L, 11L, 2L), (2L, 9000L, 9000L, 1L, 1L)))
  }

  // --- psiDrift ----------------------------------------------------------

  test("psiDrift: identical snapshots score zero, a clamped-tail shift " +
       "matches the plain-Scala twin and trips the 0.2-nat line") {
    val base = Seq(1.0, 1.0, 2.0, 2.0).map(("A", _)).toDF("s", "v")
    val same = Relational.psiDrift(base, base, "s", "v", 10)
      .as[(String, Long, Long, Long, Boolean)].head()
    assert(same == (("A", 4L, 4L, 0L, false)))
    // every current value far above the base range -> clamps to bin 9
    val cur = Seq.fill(4)(("A", 100.0)).toDF("s", "v")
    val got = Relational.psiDrift(base, cur, "s", "v", 10)
      .as[(String, Long, Long, Long, Boolean)].head()
    // plain twin: base bins {0: 2, 9: 2}, cur {9: 4}, k=10, n=4
    def prop(c: Long) = (c + 1L) * 1000000L / 14L
    def lnm(p: Long, q: Long) =
      math.round(math.log(p.toDouble / q.toDouble) * 1e6)
    val bins = (0 until 10).map { i =>
      val nb = if (i == 0 || i == 9) 2L else 0L
      val nc = if (i == 9) 4L else 0L
      val (pp, qq) = (prop(nc), prop(nb))
      (pp - qq) * lnm(pp, qq)
    }
    val want = bins.sum / 1000000L
    assert(got == (("A", 4L, 4L, want, want >= 200000L)))
    assert(got._5, "a full-mass tail shift must trip the drift line")
  }

  // --- essReport ---------------------------------------------------------

  test("essReport: uniform weights give ESS = n, a dominant weight " +
       "collapses it toward 1, non-positive weights excluded") {
    val uni = Seq.fill(8)(("A", 2.5)).toDF("s", "w")
    val u = Relational.essReport(uni, "s", "w")
      .as[(String, Long, Long, Long)].head()
    assert(u == (("A", 8L, 8000L, 1000L)))
    // weights 1,1,1,1000 (milli 1000x3, 1000000): ESS =
    // 1003000^2*1000 div (3*1e6 + 1e12) = 1006008009 div 1000003 = 1005 (milli)
    val dom = Seq(("B", 1.0), ("B", 1.0), ("B", 1.0), ("B", 1000.0),
      ("B", 0.0), ("B", -2.0)).toDF("s", "w")
    val d = Relational.essReport(dom, "s", "w")
      .as[(String, Long, Long, Long)].head()
    val s1 = BigInt(1003000); val s2 = BigInt(3) * 1000000 + BigInt("1000000000000")
    val essMilli = (s1 * s1 * 1000 / s2).toLong
    val ratio = (s1 * s1 * 1000 / (s2 * 4)).toLong
    assert(d == (("B", 4L, essMilli, ratio)))
    assert(essMilli < 1100L, s"dominant weight must collapse ESS: $essMilli")
  }

  // --- rankMetrics -------------------------------------------------------

  test("rankMetrics: hand-computed MRR and NDCG, missed queries " +
       "contribute zeros, short truth lists truncate the ideal") {
    def fr(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("query_id", "neighbor_id", "rank")
    // q1 truth: 5 items; approx hits them at ranks 2 and 5
    // q2 truth: 5 items; approx hits none -> zero contribution
    val truth = fr((1 to 5).map(r => (1L, 100L + r, r.toLong)) ++
      (1 to 5).map(r => (2L, 200L + r, r.toLong)))
    val approx = fr(Seq((1L, 999L, 1L), (1L, 102L, 2L), (1L, 998L, 3L),
      (1L, 997L, 4L), (1L, 103L, 5L),
      (2L, 996L, 1L), (2L, 995L, 2L)))
    val got = Similarity.rankMetrics(truth, approx, k = 5)
      .as[(Long, Long, Long)].head()
    // q1: mrr = 1000 div 2 = 500; dcg = 630930 + 386853 = 1017783;
    // idcg(5) = 2948460 -> ndcg = 345; q2: 0, 0
    assert(got == ((2L, 250L, 172L)))
    // single-item truth found at rank 1: perfect 1000/1000
    val t1 = fr(Seq((7L, 70L, 1L)))
    val a1 = fr(Seq((7L, 70L, 1L), (7L, 71L, 2L)))
    assert(Similarity.rankMetrics(t1, a1, 5)
      .as[(Long, Long, Long)].head() == ((1L, 1000L, 1000L)))
  }

  // --- rrfFuse -----------------------------------------------------------

  test("rrfFuse: hand-computed fusion, single-list docs, id tiebreak, " +
       "pool smaller than topK") {
    def fr(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("query_id", "neighbor_id", "rank")
    // contributions at kConst=60: r1=16393 r2=16129 r3=15873 r4=15625
    val a = fr(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
                   (2L, 21L, 1L)))
    val b = fr(Seq((1L, 11L, 1L), (1L, 13L, 2L), (1L, 10L, 3L),
                   (2L, 20L, 1L)))
    val got = Similarity.rrfFuse(Seq(a, b), kConst = 60L, topK = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // q1: 11=16129+16393=32522, 10=16393+15873=32266, then the
      // single-list docs 13 (16129) > 12 (15873)
      (1L, 11L, 32522L, 1L), (1L, 10L, 32266L, 2L),
      (1L, 13L, 16129L, 3L), (1L, 12L, 15873L, 4L),
      // q2: both rank-1 in one list each -> tied 16393, id ascending
      (2L, 20L, 16393L, 1L), (2L, 21L, 16393L, 2L)))
    // topK caps the fused list
    val top1 = Similarity.rrfFuse(Seq(a, b), 60L, topK = 1)
      .orderBy("query_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(top1 == Seq((1L, 11L, 32522L, 1L), (2L, 20L, 16393L, 1L)))
  }

  // --- robustZscore / fdCheck ----------------------------------------------

  test("robustZscore: hand-computed median/MAD flags, sign-explicit " +
       "rz, degenerate mad=0 stratum flags v != med with null rz") {
    // 'a': 1..9 and 100 -> med 5000, mad 2000; only 100 flags (47500)
    val a = (1 to 9).map(i => ("a", i.toLong, i.toDouble)) :+
      (("a", 10L, 100.0))
    // 'b': eight 5.0 + 5.2 + 50.0 -> mad 0 (majority identical)
    val b = (11 to 18).map(i => ("b", i.toLong, 5.0)) ++
      Seq(("b", 19L, 5.2), ("b", 20L, 50.0))
    val got = Relational.robustZscore((a ++ b).toDF("s", "id", "v"),
        "s", "id", "v", thresholdMilli = 3500L)
      .orderBy("id")
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("a", 10L, 100000L, 5000L, 2000L, Some(47500L)),
      ("b", 19L, 5200L, 5000L, 0L, None),
      ("b", 20L, 50000L, 5000L, 0L, None)))
  }

  test("robustZscore/clipOutliers quantMilli: coarse quantization " +
       "bounds the distribution table and floors values to multiples " +
       "(negatives included); flags stable when values sit on the grid") {
    // continuous-ish values; quantMilli=1000 floors milli values to
    // whole units: −1.2 → −2000 (floor, not truncate-toward-zero)
    val d = Seq(("s", 1L, 1.0001), ("s", 2L, 1.0002), ("s", 3L, 1.0003),
      ("s", 4L, 1.5), ("s", 5L, -1.2), ("s", 6L, 100.0))
      .toDF("st", "id", "v")
    val got = Relational.robustZscore(d, "st", "id", "v",
        thresholdMilli = 3500L, quantMilli = 1000L)
      .orderBy("id")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    // floored millis: 1000,1000,1000,1000,−2000,100000 → med 1000,
    // mad 0 (majority identical) → v≠med rows flag with null rz
    assert(got == Seq(("s", 5L, -2000L, 1000L, 0L, None),
      ("s", 6L, 100000L, 1000L, 0L, None)))
    // clipOutliers under the same grid: the distribution table has 3
    // distinct floored values; thresholds are exact on the coarse grid
    val co = Relational.clipOutliers(d, "st", "v", 5, 95,
        quantMilli = 1000L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].head()
    // dist: −2000×1, 1000×4, 100000×1 (n=6): lo = min v with cum·100
    // ≥ 5·6=30 → cum(−2000)=100 ≥ 30 → −2000; hi: cum·100 ≥ 570 →
    // 1000 (cum 500·... 5·100=500 < 570) → 100000
    assert(co == (("s", -2000L, 100000L, 6L, 0L, 0L,
      100000L + 4000L - 2000L, 100000L + 4000L - 2000L)))
  }

  test("weightedQuantiles: weight mass moves the median where row " +
       "counts would not") {
    // values 1,2,3 with weights 1,1,8: row-median is 2, the weighted
    // median is 3 (cum 1,2,10 vs tot 10: 2*2 >= 10 fails, 2*10 >= 10)
    val d = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 8L))
      .toDF("s", "v", "w")
    val got = Relational.weightedQuantiles(d, "s", "v", "w")
      .as[(String, Long, Long, Long, Long, Long)].head()
    // q1: 4*cum >= 10 first at v=3 (cum 2*4=8 < 10); q3 likewise
    assert(got == (("a", 3L, 10L, 3000L, 3000L, 3000L)))
    // equal weights collapse to the plain type-1 quantiles
    val eq = Seq(("b", 1.0, 1L), ("b", 2.0, 1L), ("b", 3.0, 1L),
      ("b", 4.0, 1L)).toDF("s", "v", "w")
    assert(Relational.weightedQuantiles(eq, "s", "v", "w")
      .as[(String, Long, Long, Long, Long, Long)].head() ==
      (("b", 4L, 4L, 1000L, 2000L, 3000L)))
  }

  test("gapFill: LOCF densify emits every span day — gaps carry the " +
       "last observation flagged, singles pass through") {
    val d = Seq(("a", 1L, 10L), ("a", 4L, 40L), ("a", 5L, 50L),
      ("b", 7L, 70L)).toDF("k", "day", "v")
    val got = Relational.gapFill(d, Seq("k"), "day", "v")
      .orderBy("k", "day")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 10L, false), ("a", 2L, 10L, true), ("a", 3L, 10L, true),
      ("a", 4L, 40L, false), ("a", 5L, 50L, false),
      ("b", 7L, 70L, false)))
  }

  test("lDiversity: homogeneous groups violate, diverse groups pass, " +
       "risk permille over the full row count") {
    // (u1,d1) types {A,A,B} ok; (u2,d1) {A,A} violates (2 rows);
    // (u3,d2) {C} violates (1 row) -> risk = 3000/6 = 500
    val d = Seq((1L, 1L, "A"), (1L, 1L, "A"), (1L, 1L, "B"),
      (2L, 1L, "A"), (2L, 1L, "A"), (3L, 2L, "C"))
      .toDF("user_id", "day", "event_type")
    val got = Relational.lDiversity(d, Seq("user_id", "day"),
        "event_type", l = 2L)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((6L, 3L, 2L, 3L, 500L)))
  }

  test("fdCheck: violated FD quantifies fanout; a holding FD reads " +
       "zero violations") {
    val v = Seq(("A", "x"), ("A", "y"), ("A", "x"), ("B", "z"),
      ("C", "z")).toDF("det", "dep")
    assert(Relational.fdCheck(v, "det", "dep")
      .as[(Long, Long, Long, Long)].head() == ((3L, 1L, 3L, 2L)))
    val h = Seq(("A", "x"), ("B", "x")).toDF("det", "dep")
    assert(Relational.fdCheck(h, "det", "dep")
      .as[(Long, Long, Long, Long)].head() == ((2L, 0L, 0L, 1L)))
  }

  // --- concentrationReport -------------------------------------------------

  test("concentrationReport: uniform reads gini 0, a whale stratum " +
       "hand-computes, small strata null their top shares") {
    // u: 10 equal values -> gini 0, top-10% (1 row) holds 100 permille
    // k: nine 0.001s + one 10.0 -> gnum = -9 + 90000 = 89991,
    //    gini = 10000*89991 div (10*10009) = 8991; top-10% = 999
    // q: 3 rows -> n < 10 -> both shares null
    val d = (Seq.fill(10)(("u", 1.0)) ++
      Seq.fill(9)(("k", 0.001)) ++ Seq(("k", 10.0)) ++
      Seq(("q", 2.0), ("q", 3.0), ("q", 4.0)))
      .toDF("stratum", "value")
    val got = Relational.concentrationReport(d, "stratum", "value")
      .orderBy("stratum")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("k", 10L, 10009L, Some(8991L), None, Some(999L)),
      ("q", 3L, 9000L, Some(1481L), None, None),
      ("u", 10L, 10000L, Some(0L), None, Some(100L))))
  }
}
