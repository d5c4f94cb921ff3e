package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Repetition statistics + unigram-LM cross-entropy against
  * hand-computed fixtures.
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetition_stats: hand-computed ratios on a crafted document") {
    // tokens: a b a b a  →  5 tokens, 2 distinct → ttr 0.4
    // bigrams: (a b)×2 (b a)×2 → top 2/4 = 0.5
    // trigrams: (a b a)×2 (b a b)×1 → dup occurrences 2/3
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "text", "doc_id").head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.4)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
  }

  test("repetition_stats: degenerate short documents get 0.0 gram stats") {
    val docs = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // one token: no bigrams/trigrams
    assert(out(0).getLong(1) == 1L)
    assert(out(0).getDouble(3) == 0.0 && out(0).getDouble(4) == 0.0)
    // two tokens: one bigram (itself the top), no trigrams
    assert(out(1).getDouble(3) == 1.0)
    assert(out(1).getDouble(4) == 0.0)
  }

  test("repetition_stats: a repetition-heavy doc scores worse than clean text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight different words appear exactly once here now")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(3) == 1.0 && out(0).getDouble(4) == 1.0)
    assert(out(1).getDouble(2) == 1.0) // all-distinct ttr
    assert(out(1).getDouble(3) < 0.2 && out(1).getDouble(4) == 0.0)
  }

  test("unigram LM cross-entropy matches a hand-rolled model") {
    // corpus stream: a a a b | b  →  N=5, V=2, counts a=3 b=2
    // p(a)=(3+1)/(5+2)=4/7, p(b)=(2+1)/(5+2)=3/7
    val docs = Seq((1L, "a a a b"), (2L, "b")).toDF("doc_id", "text")
    val lm = TextAnalysis.unigramLm(docs, "text")
    val lpMicro = lm.as[(String, Long)].collect().toMap
    assert(lpMicro("a") == math.rint(-math.log(4.0 / 7.0) * 1e6).toLong)
    assert(lpMicro("b") == math.rint(-math.log(3.0 / 7.0) * 1e6).toLong)

    val ce = TextAnalysis.crossEntropy(docs, "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    // the mean is integer round-half-up: (2s+n) div (2n) micro-nats —
    // (3·la+lb)/4 lands exactly on a .5 boundary here, deliberately
    def meanMicro(s: Long, n: Long) = ((2 * s + n) / (2 * n)).toDouble / 1e6
    val la = lpMicro("a"); val lb = lpMicro("b")
    assert(ce(0).getLong(1) == 4L)
    assert(ce(0).getDouble(2) == meanMicro(3 * la + lb, 4))
    assert(ce(1).getDouble(2) == meanMicro(lb, 1))
  }

  test("cross-entropy ranks an all-rare-word doc above common text") {
    val docs = (1L to 20L).map(i => (i, "common words common words"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "zyzzyva qwyjibo")).toDF("doc_id", "text"))
    val lm = TextAnalysis.unigramLm(docs, "text")
    val ce = TextAnalysis.crossEntropy(docs, "doc_id", "text", lm)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(ce(99L) > ce(1L)) // rare tokens → higher surprisal
  }

  test("unicode normalization: NFC recomposes combining marks, NFD undoes it") {
    val decomposed = "cafe\u0301 nai\u0308ve" // e/i + combining acute/diaeresis
    val precomposed = "caf\u00e9 na\u00efve"   // single code points
    val docs = Seq((1L, decomposed), (2L, "plain")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        graft.functions.NormalizeUnicodeExpr(col("text"), "NFC").as("nfc"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out(0)._2 == precomposed)
    assert(out(1)._2 == "plain")
    // round-trip: NFD(NFC(x)) re-decomposes
    val nfd = docs.filter(col("doc_id") === 1L)
      .select(graft.functions.NormalizeUnicodeExpr(
        graft.functions.NormalizeUnicodeExpr(col("text"), "NFC"), "NFD"))
      .as[String].head()
    assert(nfd == decomposed)
  }

  test("tfidf keywords: hand-computed weights, ubiquitous words rank last") {
    // 3 docs; "common" in all → idf 0; "rare" only in doc 1
    val docs = Seq(
      (1L, "rare rare common alpha"),
      (2L, "common alpha beta"),
      (3L, "common beta beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long, Long)].collect()
    def idfMicro(df: Long) = math.rint(math.log(3.0 / df) * 1e6).toLong
    // doc 1: rare (tf 2, df 1) beats alpha (tf 1, df 2) beats common (idf 0)
    assert(out.filter(_._1 == 1L).map(x => (x._3, x._5)).toSeq == Seq(
      ("rare", 2 * idfMicro(1)), ("alpha", idfMicro(2))))
    // doc 3: gamma (tf 1 × ln3 ≈ 1.099M µnats) beats beta (2 × ln1.5 ≈ 0.811M)
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq("gamma", "beta"))
    // every doc emits exactly k (or vocab-size) rows with ranks 1..k
    assert(out.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.sameElements(1L to rs.length) })
  }

  test("chunkDocuments: window/stride semantics on hand-counted docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, (1 to 11).map(i => s"w$i").mkString(" "))) // sub-stride tail
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_ix")
      .as[(Long, Long, Long, String)].collect()
    // doc 1: starts 0,3,6 → [w1..w4],[w4..w7],[w7..w10] — last window
    // reaches the end, no extra sub-stride tail window
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // doc 2: one whole-doc chunk
    assert(out.filter(_._1 == 2L).map(x => (x._3, x._4)).toSeq ==
      Seq((3L, "a b c")))
    // doc 3 (11 toks): starts 0,3,6,9 → final PARTIAL window w10 w11
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10 w11"))
    // map-side only
    val plan = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("segmentDedup: first occurrence survives, docs reassemble in order") {
    val docs = Seq(
      (1L, "a b c d e f"),   // segs [a b c] [d e f] — both first
      (2L, "a b c x y z"),   // [a b c] is doc 1's → dropped; [x y z] kept
      (3L, "d e f"),         // whole doc is a dup segment → empty text
      (4L, "  ")             // no tokens → no row at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.segmentDedup(docs, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 1L, 0L, "")))
  }

  test("domainMix: integer sizing — binding stratum keeps all, rest thin") {
    // A: 4 docs @500‰, B: 8 docs @500‰ → scale = min(4000/500, 8000/500)
    // = 8 → A keeps 8·500/1000 = 4 of 4 (permille 1000 — every doc
    // regardless of fingerprint), B keeps 4 of 8 (permille 500 — the
    // fp%1000<500 subset). C has no target and vanishes.
    val rows = (1 to 4).map(i => (i.toLong, "A", s"alpha doc $i")) ++
               (5 to 12).map(i => (i.toLong, "B", s"beta doc number $i")) ++
               Seq((13L, "C", "no target"))
    val df = rows.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.domainMix(df, "lang", "text", "doc_id",
        Map("A" -> 500, "B" -> 500))
      .as[(Long, String)].collect().toSet
    assert(out.count(_._2 == "A") == 4)
    val bFps = df.filter(col("lang") === "B")
      .select(col("doc_id"),
        pmod(TextAnalysis.fingerprint(col("text")), lit(1000L)))
      .as[(Long, Long)].collect().toMap
    assert(out.filter(_._2 == "B").map(_._1) ==
      bFps.filter(_._2 < 500).keySet)
    assert(!out.exists(_._2 == "C"))
  }

  test("bigram LM: hand-computed surprisal across all three backoff tiers") {
    // fit: "a b a b" + "a c" → V={a,b,c}=3; c(a)=3, c(b)=1;
    // c(a,b)=2, c(b,a)=1, c(a,c)=1
    val fit = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val (bi, ctx, g) = TextAnalysis.bigramLm(fit, "text")
    // score "a b z q": (a,b) seen → ln(6/3)=ln2 = 693147µ;
    // (b,z) unseen cur, seen ctx → ln(1+3)=ln4 = 1386294µ;
    // (z,q) unseen ctx → ln(V)=ln3 = 1098612µ
    // sum 3178053, n=3 → mean 1059351 exactly
    val docs = Seq((10L, "a b z q"), (11L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.crossEntropyBigram(docs, "doc_id", "text", bi, ctx, g)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((10L, 3L, 1.059351)))  // <2-token doc: no row
  }

  test("boilerplateSegments: shared segments stripped from EVERY doc") {
    val docs = Seq(
      (1L, "a b c d e f"),  // [a b c] shared → stripped, keeps "d e f"
      (2L, "a b c x y z"),  // ditto, keeps "x y z"
      (3L, "a b c")         // entirely boilerplate → empty clean text
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateSegments(docs, "doc_id", "text",
        segTokens = 3, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.5, "d e f"),
      (2L, 2L, 1L, 0.5, "x y z"),
      (3L, 1L, 1L, 1.0, "")))
  }

  test("spanContamination: misaligned verbatim span caught via stride-1 bench") {
    val benchmark = Seq((100L, "b1 b2 b3 b4 b5 b6 b7")).toDF("doc_id", "text")
    val corpus = Seq(
      // [b2..b6] sits at corpus offset 2 (stride-2-aligned) but at
      // benchmark offset 1 — only the every-offset bench side finds it
      (1L, "x1 x2 b2 b3 b4 b5 b6 y1"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.spanContamination(corpus, benchmark,
        "doc_id", "text", spanTokens = 5, corpusStride = 2, benchStride = 1)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 100L, 1L)))
  }

  test("bloomContamination ≡ exact contamination, prefilter in the plan") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val benchmark = corpus.filter(col("doc_id") % 3 === 0)
    val exact = TextAnalysis.contamination(corpus, benchmark,
        "doc_id", "text", shingleN = 3, minShared = 4)
      .as[(Long, Long, Long)].collect().toSet
    val bloomed = TextAnalysis.bloomContamination(corpus, benchmark,
      "doc_id", "text", shingleN = 3, minShared = 4)
    assert(bloomed.as[(Long, Long, Long)].collect().toSet == exact)
    assert(exact.nonEmpty) // the fixture actually exercises overlaps
    // the Bloom probe gates the corpus side BEFORE the join (map-side)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter:\n$plan")
  }

  test("OncePerRowExpr pins one evaluation under multi-reference projection") {
    // parquet-backed so ConvertToLocalRelation can't pre-fold the parse
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(3)
      .select(col("doc_id"),
        format_string("""{"a": %s, "b": 2}""", col("doc_id")).as("js"))
    val parsed = docs.select(col("doc_id"), graft.functions.OncePerRowExpr(
        from_json(col("js"), "a INT, b INT", Map.empty[String, String])).as("w"))
      .select(col("doc_id"), col("w")("a").as("a"), col("w")("b").as("b"),
              (col("w")("a") + col("w")("b")).as("sum"))
    val plan = parsed.queryExecution.executedPlan.toString
    assert("from_json".r.findAllIn(plan).size == 1,
      s"parse duplicated:\n$plan")
    val r = parsed.orderBy("doc_id").collect()
    assert(r.map(x => (x.getInt(1), x.getInt(2), x.getInt(3))).toSeq ==
      Seq((0, 2, 2), (1, 2, 3), (2, 2, 4)))
  }

  test("quality ratios are 0.0 — never null — on empty and null text") {
    val docs = Seq((1L, "the quick fox"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = TextAnalysis.quality(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // normal doc: real ratios
    assert(out(0).getLong(1) == 13L)
    assert(out(0).getDouble(4) > 0.0) // avg_token_len
    // empty and null text: every column 0.0/0, no nulls anywhere
    Seq(out(1), out(2)).foreach { r =>
      assert(!r.anyNull, s"null cell in $r")
      assert(r.getLong(1) == 0L)
      (2 to 5).foreach(i => assert(r.getDouble(i) == 0.0, s"col $i of $r"))
    }
  }

  test("LM tokenization strips empty tokens: ragged spacing mints no phantom vocab") {
    // "a  b" with a double space: the old split-on-" " minted a ""
    // vocab word; the \s+ empty-stripped definition must not
    val docs = Seq((1L, "a  b"), (2L, " a b ")).toDF("doc_id", "text")
    val lm = TextAnalysis.unigramLm(docs, "text")
    assert(lm.select("word").as[String].collect().toSet == Set("a", "b"))
    val ce = TextAnalysis.crossEntropy(docs, "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    // both docs are the same 2-token stream → identical n_tokens + score
    assert(ce(0).getLong(1) == 2L && ce(1).getLong(1) == 2L)
    assert(ce(0).getDouble(2) == ce(1).getDouble(2))
  }

  test("SharedExpr.select: one from_json under With/CommonExpressionRef, values exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(3)
      .select(col("doc_id"),
        format_string("""{"a": %s, "b": 2}""", col("doc_id")).as("js"))
    val out = graft.functions.SharedExpr.select(docs,
      from_json(col("js"), "a INT, b INT", Map.empty[String, String])) { w =>
      Seq("a" -> w("a"), "b" -> w("b"), "sum" -> (w("a") + w("b")))
    }
    val plan = out.queryExecution.executedPlan.toString
    assert("from_json".r.findAllIn(plan).size == 1, s"parse duplicated:\n$plan")
    assert(!plan.contains("Generate"), s"unexpected Generate:\n$plan")
    assert(plan.contains("_common_expr"),
      s"RewriteWithExpression did not hoist the shared def:\n$plan")
    val r = out.collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getInt(2))).sorted.toSeq ==
      Seq((0, 2, 2), (1, 2, 3), (2, 2, 4)))
    // determinism preserved: a filter on an output column pushes BELOW
    // the hoisted shared projection (carrying its own field-pruned
    // parse) instead of being blocked the way a nondeterminism barrier
    // blocks it — rows are parsed-in-full only after the filter
    val filtered = graft.functions.SharedExpr.select(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"),
          format_string("""{"a": %s, "b": 2}""", col("doc_id")).as("js")),
      from_json(col("js"), "a INT, b INT", Map.empty[String, String])) { w =>
      Seq("a" -> w("a"), "b" -> w("b"))
    }.filter(col("a") > 100)
    assert(filtered.count() > 0)
    val fplan = filtered.queryExecution.optimizedPlan.toString
    val lines = fplan.linesIterator.toSeq
    val projIx = lines.indexWhere(_.contains("_common_expr"))
    val filterIx = lines.indexWhere(_.contains("Filter ("))
    assert(projIx >= 0, s"no hoisted shared def:\n$fplan")
    assert(filterIx > projIx,
      s"filter did not push below the shared projection:\n$fplan")
  }

  test("repetition stats plan is map-side only (no shuffle)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("cooccurrencePmi: hand-computed counts and micro-nat PMI, window edges") {
    // "a b a c", window 2 → δ1: (a,b)(b,a)(a,c); δ2: (a,a)(b,c); T=5
    // c1: a=3 b=2; c2: a=2 b=1 c=2
    val docs = Seq((1L, "a b a c"), (2L, "x"), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrencePmi(docs, "text", window = 2)
      .orderBy("w1", "w2")
      .as[(String, String, Long, Long)].collect().toSeq
    def micro(c: Long, c1: Long, c2: Long) =
      math.round(1e6 * math.log(c.toDouble * 5.0 / (c1.toDouble * c2.toDouble)))
    assert(out == Seq(
      ("a", "a", 1L, micro(1, 3, 2)),
      ("a", "b", 1L, micro(1, 3, 1)),
      ("a", "c", 1L, micro(1, 3, 2)),
      ("b", "a", 1L, micro(1, 2, 2)),
      ("b", "c", 1L, micro(1, 2, 2))))
    // single-word and blank docs emit no pairs (covered: only doc 1
    // contributed); a doc shorter than the window is safe
    val shortOnly = Seq((1L, "p q")).toDF("doc_id", "text")
    val so = TextAnalysis.cooccurrencePmi(shortOnly, "text", window = 3)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(so == Seq(("p", "q", 1L, 0L))) // ln(1·1/(1·1)) = 0
  }

  test("charEntropy: hand-computed micro-nats, empty text, code points") {
    val docs = Seq(
      (1L, "aab"),        // N=3, counts {a:2, b:1}
      (2L, ""),           // empty → [0, 0]
      (3L, "zzzz"),       // single symbol → entropy 0
      (4L, "ab😀")) // surrogate pair = ONE code point → N=3
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    def q(x: Long) = math.round(1e6 * math.log(x.toDouble))
    // H(aab) = q(3) − round_half_up(2·q(2) / 3)
    val h1 = q(3) - (2 * (2 * q(2)) + 3) / 6
    assert(out == Seq(
      (1L, 3L, h1),
      (2L, 0L, 0L),
      (3L, 4L, 0L),            // q(4) − (4·q(4))/4 = 0
      (4L, 3L, q(3))))         // three distinct code points: max entropy ln 3
  }

  test("ngramCounts: corpus counts, cutoff, short-doc guard, ws raggedness") {
    val docs = Seq(
      (1L, "a b c a b c"),     // grams: abc, bca, cab, abc
      (2L, "a  b\tc"),         // ragged ws → same "a b c" gram once
      (3L, "x y"),             // shorter than n → nothing
      (4L, ""))                // empty → nothing
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(docs, "text", n = 3, minCount = 2L)
      .orderBy("gram").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b c", 3L)))   // 2 from doc 1 + 1 from doc 2
    // cutoff 1 keeps the singletons too
    val all = TextAnalysis.ngramCounts(docs, "text", n = 3, minCount = 1L)
      .as[(String, Long)].collect().toMap
    assert(all == Map("a b c" -> 3L, "b c a" -> 1L, "c a b" -> 1L))
  }

  test("AhoCorasick: overlaps, nested patterns, fail links, dedup") {
    val ac = new graft.functions.AhoCorasick(
      Array("abcab", "cab", "b", "xyz"))
    // "abcab": ends "abcab" (0), "cab" (1, via fail-merged output),
    // "b" (2, twice — reported once). "xyz" absent.
    assert(ac.matchedPatterns("abcab").toSeq == Seq(0, 1, 2))
    // fail-link walk: "abcaX" breaks the long pattern, "cab" alone later
    assert(ac.matchedPatterns("zzcabzz").toSeq == Seq(1, 2))
    assert(ac.matchedPatterns("").toSeq == Seq())
    assert(ac.matchedPatterns("no match here").toSeq == Seq())
    // a pattern that is a strict prefix-chain suffix: "bb" vs "b"
    val ac2 = new graft.functions.AhoCorasick(Array("bb", "b"))
    assert(ac2.matchedPatterns("abba").toSeq == Seq(0, 1))
    assert(ac2.matchedPatterns("aba").toSeq == Seq(1))
  }

  test("AhoCorasick fuzz: 300 seeded cases vs naive contains truth") {
    // small alphabet maximizes overlaps, shared prefixes and fail-link
    // traffic — the regimes where automaton bugs live
    val rnd = new scala.util.Random(0xC0FFEE)
    def randStr(maxLen: Int): String = {
      val n = 1 + rnd.nextInt(maxLen)
      String.valueOf(Array.fill(n)(('a' + rnd.nextInt(3)).toChar))
    }
    (1 to 300).foreach { i =>
      val patterns = Array.fill(1 + rnd.nextInt(6))(randStr(4)).distinct
      val text = randStr(40)
      val ac = new graft.functions.AhoCorasick(patterns)
      val got = ac.matchedPatterns(text).toSeq
      val want = patterns.indices.filter(j => text.contains(patterns(j)))
      assert(got == want,
        s"case $i: text='$text' patterns=${patterns.mkString(",")} " +
        s"got=$got want=$want")
    }
  }

  test("blocklistMatches: explode semantics + codegen coverage") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "nothing to see"),
      (3L, "quick quick fox"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistMatches(docs, "text", "doc_id",
        Seq("quick", "fox", "wolf"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "quick"), (1L, "fox"),
                      (3L, "quick"), (3L, "fox"))) // doc 2 emits nothing
    val gen = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.MultiMatchExpr(col("text"),
        Seq("quick")).as("m"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("WholeStageCodegen"), "no codegen span")
    assert(gen.contains("graft.functions.MultiMatchExpr"),
      "matcher fell out of codegen")
  }

  test("codeDetect: code fixture scores high on all four signals, " +
       "prose scores low, empty doc is all zeros") {
    val code = "def f(x):\n    return x + 1;\n    y = {1: 2};\nclass A {\n}"
    val prose = "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times and nothing else happened that day."
    val docs = Seq((1L, code), (2L, prose), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeDetect(docs, "doc_id", "text", 150L)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "punct_line_permille",
        "indent_line_permille", "kw_permille", "symbol_permille",
        "score_permille", "is_code")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    val (c, p, e) = (got(0), got(1), got(2))
    // code: 5 lines; ";" x2 + "}" x2 end 4 of 5 lines (line 1 ends ":")
    //   -> 800; indent 2/5 -> 400; keywords def/return/class = 3 of 14
    //   tokens -> 214; score = (2400 + 800 + 642 + 2*sym) div 10
    assert(c._2 == 5L && c._3 == 800L && c._4 == 400L)
    assert(c._7 >= 150L && c._8, s"code fixture must flag: $c")
    // prose: no terminator lines, no indent, no keywords ("It"/"the"
    //   are not in the list), near-zero symbols
    assert(p._3 == 0L && p._4 == 0L && p._5 == 0L && p._6 == 0L)
    assert(p._7 == 0L && !p._8)
    // empty: zero everything, not a division error
    assert(e == ((3L, 0L, 0L, 0L, 0L, 0L, 0L, false)))
  }

  test("sentenceSegment: indices, terminator runs, unterminated tail " +
       "flagged, degenerate docs emit nothing") {
    val docs = Seq(
      (1L, "One two. Three?! Four no end"),
      (2L, "..."),            // only terminators -> nothing
      (3L, ""),               // empty -> nothing
      (4L, "Hi.")).toDF("doc_id", "text")
    val got = TextAnalysis.sentenceSegment(docs, "doc_id", "text")
      .orderBy("doc_id", "sent_ix")
      .as[(Long, Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "One two.", 8L, 2L, true),
      (1L, 2L, "Three?!", 7L, 1L, true),
      (1L, 3L, "Four no end", 11L, 3L, false),
      (4L, 1L, "Hi.", 3L, 1L, true)))
  }

  test("logTemplates: hex-before-digit masking, multi-line docs, " +
       "min-count filter, lexicographic example") {
    val docs = Seq(
      "GET /api/v2/user/123 took 45ms\nGET /api/v2/user/9 took 3ms",
      "session deadbeef01 expired\nsession cafebabe99 expired",
      "   \nonce-only line 7").toDF("text")
    val got = TextAnalysis.logTemplates(docs, "text", minCount = 2L)
      .orderBy("template")
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(
      ("GET /api/v<N>/user/<N> took <N>ms", 2L,
       "GET /api/v2/user/123 took 45ms"),
      ("session <H> expired", 2L, "session cafebabe99 expired")))
    // blank line dropped; the once-only line fails minCount
  }

  test("vocabGrowth: first-seen accounting, monotone vocab, cumulative " +
       "token totals, empty-bucket zeros") {
    // ids 0..9, 2 buckets (0-4, 5-9). tokens: a b in bucket 0; b c in
    // bucket 1 -> new: {0: a,b}, {1: c}; vocab 2 then 3
    val docs = Seq((0L, "a b"), (4L, "b a"), (5L, "b c"), (9L, "c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", 2)
      .orderBy("bucket")
      .select("bucket", "new_tokens", "bucket_tokens", "vocab",
        "corpus_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 4L, 2L, 4L), (1L, 1L, 3L, 3L, 7L)))
    // all vocabulary in the first slice: later buckets add zero new
    val flat = Seq((0L, "x y z"), (5L, "x"), (9L, "y z"))
      .toDF("doc_id", "text")
    val f = TextAnalysis.vocabGrowth(flat, "doc_id", "text", 2)
      .orderBy("bucket").select("new_tokens", "vocab")
      .as[(Long, Long)].collect().toSeq
    assert(f == Seq((3L, 3L), (0L, 3L)))
  }

  test("truncateTokens: budget enforced with canonical rejoin, short " +
       "docs pass through, whitespace runs collapse") {
    val docs = Seq(
      (1L, "a b  c\td e"),        // 5 tokens, max 3 -> "a b c", lost 2
      (2L, "one two"),            // under budget -> unchanged, lost 0
      (3L, "  x  ")).toDF("doc_id", "text")
    val got = TextAnalysis.truncateTokens(docs, "doc_id", "text",
        maxTokens = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Boolean, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a b c", 5L, true, 2L),
      (2L, "one two", 2L, false, 0L),
      (3L, "x", 1L, false, 0L)))
  }

  test("dedupLines: first occurrence kept in order, counts exact, " +
       "clean docs pass through, empty lines dedup too") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb\na"),   // -> a,b,c ; 6 lines, 3 removed
      (2L, "x\ny\nz"),            // clean -> unchanged
      (3L, "a\n\nb\n\na"))        // empties dedup -> a,"",b
      .toDF("doc_id", "text")
    val got = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a\nb\nc", 6L, 3L),
      (2L, "x\ny\nz", 3L, 0L),
      (3L, "a\n\nb", 5L, 2L)))
  }

  test("ngramCoverage: deterministic ranking, per-gram and cumulative " +
       "permilles, tie break by gram") {
    // bigrams over "a b a b c": (a b)x2, (b a), (b c) -> total 4
    val docs = Seq("a b a b c").toDF("text")
    val got = TextAnalysis.ngramCoverage(docs, "text", n = 2, k = 3)
      .orderBy("rank")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a b", 2L, 500L, 500L),
      (2L, "b a", 1L, 250L, 750L),
      (3L, "b c", 1L, 250L, 1000L)))
    // k larger than distinct grams: just returns them all
    val all = TextAnalysis.ngramCoverage(docs, "text", 2, 100)
    assert(all.count() == 3L)
  }
}
