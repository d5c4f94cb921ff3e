package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions must agree exactly with the Column API
  * (same Expression underneath) and reject non-literal tuning args.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsView(): Unit =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).createOrReplaceTempView("sql_fn_docs")

  test("sketch functions via spark.sql ≡ Column API") {
    docsView()
    val viaSql = spark.sql("""
      SELECT doc_id,
             graft_simhash64(split(text, ' ')) AS sh,
             graft_minhash_bands(graft_shingles(split(text, ' '), 3), 64, 16) AS mb,
             graft_rolling_hash(text) AS rh
      FROM sql_fn_docs""")
      .as[(Long, Long, Seq[Long], Long)].collect().sortBy(_._1)
    val d = spark.table("sql_fn_docs")
    val toks = split(col("text"), " ")
    val viaCol = d.select(col("doc_id"),
        graft.functions.SimHash64Expr(toks).as("sh"),
        graft.functions.MinHashBandsExpr(
          graft.functions.ShinglesExpr(toks, 3), 64, 16).as("mb"),
        graft.functions.RollingHashExpr(col("text"), 31L, 1000000007L).as("rh"))
      .as[(Long, Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("repetition, unicode and trim functions work from SQL") {
    // the SQL literal embeds e + combining acute (decomposed, 5 code
    // points); NFC recomposes to 4
    val r = spark.sql(
      "SELECT graft_repetition_stats(split('a b a b a', ' ')) AS rep, " +
      "graft_normalize_unicode('cafe\u0301', 'NFC') AS nfc, " +
      "graft_trim_punctuation('Title /') AS trimmed, " +
      "graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos").head()
    assert(r.getSeq[Double](0) == Seq(0.4, 0.5, 2.0 / 3.0))
    assert(r.getString(1) == "caf\u00e9")
    assert(r.getString(1).length == 4)
    assert(r.getString(2) == "Title")
    assert(r.getDouble(3) == 1.0)
  }

  test("graft_approx_top aggregates from SQL ≡ exact counts (exact regime)") {
    docsView()
    val viaSql = spark.sql("""
      SELECT t.e.token, t.e.est_count FROM (
        SELECT graft_approx_top(word, 256) AS sk FROM (
          SELECT explode(split(text, ' ')) AS word FROM sql_fn_docs)) s
      LATERAL VIEW explode(s.sk) t AS e""")
      .as[(String, Long)].collect().toMap
    val truth = spark.table("sql_fn_docs")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(viaSql == truth)
  }

  test("non-literal tuning arguments are rejected at analysis") {
    docsView()
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_shingles(split(text, ' '), CAST(doc_id AS INT)) FROM sql_fn_docs")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("wrong arity and out-of-range literals are rejected, not silently ignored") {
    docsView()
    // extra argument: must error, never silently use the hardcoded base
    val extra = intercept[Exception] {
      spark.sql("SELECT graft_rolling_hash(text, 37) FROM sql_fn_docs").collect()
    }
    assert(extra.getMessage.contains("expects 1 argument"), extra.getMessage)
    val missing = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0D)) FROM sql_fn_docs").collect()
    }
    assert(missing.getMessage.contains("expects 2 argument"), missing.getMessage)
    // BIGINT literal outside Int range: must error, never wrap
    val range = intercept[Exception] {
      spark.sql(
        "SELECT graft_shingles(split(text, ' '), 4294967299) FROM sql_fn_docs")
        .collect()
    }
    assert(range.getMessage.contains("out of integer range"), range.getMessage)
  }

  test("graft_char_entropy and graft_multi_match from SQL ≡ Column API") {
    docsView()
    val viaSql = spark.sql("""
      SELECT doc_id, graft_char_entropy(text) AS e,
             graft_multi_match(text, array('window', 'windowed', 'zebra')) AS m
      FROM sql_fn_docs""")
      .as[(Long, Seq[Long], Seq[String])].collect().sortBy(_._1)
    val d = spark.table("sql_fn_docs")
    val viaCol = d.select(col("doc_id"),
        graft.functions.CharEntropyExpr(col("text")).as("e"),
        graft.functions.MultiMatchExpr(col("text"),
          Seq("window", "windowed", "zebra")).as("m"))
      .as[(Long, Seq[Long], Seq[String])].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.exists(_._3.nonEmpty)) // the corpus really matches
    // patterns must be a literal array
    val bad = intercept[Exception] {
      spark.sql(
        "SELECT graft_multi_match(text, split(text, ' ')) FROM sql_fn_docs")
        .collect()
    }
    assert(bad.getMessage.contains("literal array"), bad.getMessage)
  }

  test("graft_bpe_encode and graft_unigram_encode from SQL ≡ Column API") {
    docsView()
    // small hand-fixed tables: the SQL path must produce the exact token
    // streams the Column API's native expressions produce
    val merges = Seq(("t</w>", "h", 0), ("e", "r</w>", 1), ("h", "e", 2))
    val mergesSql = merges.map { case (l, r, _) => s"'$l $r'" }.mkString(", ")
    val pieces = Seq(("the", -1000000L), ("th", -1500000L), ("e", -2000000L),
                     ("r", -2100000L), ("o", -2200000L), ("t", -2300000L),
                     ("h", -2400000L))
    val piecesSql = pieces.map(p => s"'${p._1}'").mkString(", ")
    val scoresSql = pieces.map(p => s"${p._2}L").mkString(", ")
    val viaSql = spark.sql(s"""
      SELECT doc_id,
             graft_bpe_encode(lower(substring(text, 1, 64)),
                              array($mergesSql)) AS bpe,
             graft_unigram_encode(lower(substring(text, 1, 64)),
                                  array($piecesSql), array($scoresSql), 3) AS uni
      FROM sql_fn_docs""")
      .as[(Long, Seq[String], Seq[String])].collect().sortBy(_._1)
    val d = spark.table("sql_fn_docs")
    val t = lower(substring(col("text"), 1, 64))
    val viaCol = d.select(col("doc_id"),
        graft.functions.BpeEncodeExpr(t, merges).as("bpe"),
        graft.functions.UnigramEncodeExpr(t, pieces, 3).as("uni"))
      .as[(Long, Seq[String], Seq[String])].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.exists(_._2.nonEmpty) && viaSql.exists(_._3.nonEmpty))
    // mismatched parallel arrays must be rejected at plan time
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_unigram_encode('x', array('a','b'), array(1L), 3)")
        .collect()
    }
    assert(bad.getMessage.contains("same length"), bad.getMessage)
    // malformed merge entry (no space) must be rejected
    val badMerge = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode('x', array('ab'))").collect()
    }
    assert(badMerge.getMessage.contains("left right"), badMerge.getMessage)
  }

  test("graft_zorder from SQL ≡ Column API and hand-computed interleave") {
    // x=3 (011), y=5 (101): x bits at even positions 0,2 -> 1+4=5;
    // y bits at odd positions 1,5 -> 2+32=34; z = 39
    val one = spark.sql("SELECT graft_zorder(3, 5, 4) AS z").head().getLong(0)
    assert(one == 39L)
    docsView()
    val viaSql = spark.sql("""
      SELECT doc_id, graft_zorder(doc_id, length(text), 16) AS z
      FROM sql_fn_docs""").as[(Long, Long)].collect().sortBy(_._1)
    val viaCol = spark.table("sql_fn_docs")
      .select(col("doc_id"),
        graft.operators.Layout.zorderValue(
          col("doc_id"), length(col("text")), 16).as("z"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    // bits must be a literal
    val bad = intercept[Exception] {
      spark.sql(
        "SELECT graft_zorder(doc_id, 1, CAST(doc_id AS INT)) FROM sql_fn_docs")
        .collect()
    }
    assert(bad.getMessage.contains("literal"), bad.getMessage)
  }

  test("graft_kmv_sketch/merge from SQL: sketch → merge ≡ exact distinct") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i % 120).toLong))
      .toDF("g", "v")
    df.createOrReplaceTempView("sql_fn_kmv")
    // two-level: per-group sketches, then a merged all-groups count —
    // the store's read shape, straight from SQL
    val got = spark.sql("""
      SELECT s.n_distinct, s.is_exact FROM (
        SELECT graft_kmv_merge(sk, 1024) AS s FROM (
          SELECT g, graft_kmv_sketch(v, 1024) AS sk
          FROM sql_fn_kmv GROUP BY g))""").head()
    assert(got.getLong(0) == 120L)
    assert(got.getBoolean(1))
    // per-group sketch counts equal per-group distinct truth
    val per = spark.sql("""
      SELECT g, graft_kmv_merge(sk, 1024) AS s FROM (
        SELECT g, graft_kmv_sketch(v, 1024) AS sk
        FROM sql_fn_kmv GROUP BY g) GROUP BY g""")
      .selectExpr("g", "s.n_distinct").as[(String, Long)].collect().toMap
    val truth = (1 to 500).map(i => (s"g${i % 3}", (i % 120).toLong))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).distinct.size.toLong }
    assert(per == truth)
  }

  test("graft_hll_sketch/merge from SQL ≡ Column API registers") {
    val df = (1 to 800).map(i => (s"g${i % 2}", (i % 300).toLong))
      .toDF("g", "v")
    df.createOrReplaceTempView("sql_fn_hll")
    // merged per-group partials equal one direct sketch over all rows
    val merged = spark.sql("""
      SELECT graft_hll_merge(sk, 8) AS r FROM (
        SELECT g, graft_hll_sketch(v, 8) AS sk
        FROM sql_fn_hll GROUP BY g)""").as[Seq[Long]].head()
    val direct = df.agg(
      graft.functions.HllSketch.sketch(col("v"), 8).as("r"))
      .as[Seq[Long]].head()
    assert(merged == direct)
    // literal-arg validation mirrors the other sketch fns
    intercept[Exception] {
      spark.sql("SELECT graft_hll_sketch(v, v) FROM sql_fn_hll").collect()
    }
  }

  test("graft_kll_merge from SQL folds store partials ≡ direct sketch") {
    // store-shaped partials (one sketch per (key, half)) built by the
    // operator path, merged from SQL — must equal one direct
    // graft_quantile_sketch over all values
    val rows = (1 to 300).map(i => ("k", ((i * 37) % 500).toLong))
    val halves = rows.zipWithIndex.map { case ((k, v), i) =>
      (s"$k${i % 2}", v)
    }.toDF("k", "v")
    graft.operators.Relational.kllPartials(halves, Seq("k"), "v", 4096)
      .createOrReplaceTempView("sql_fn_kll_partials")
    val merged = spark.sql("""
      SELECT graft_kll_merge(sketch, 4096, array(0.5, 0.9)) AS s
      FROM sql_fn_kll_partials""")
      .selectExpr("s.n", "s.err_bound", "s.qs").head()
    rows.toDF("k", "v").createOrReplaceTempView("sql_fn_kll_all")
    val direct = spark.sql("""
      SELECT graft_quantile_sketch(v, 4096, array(0.5, 0.9)) AS s
      FROM sql_fn_kll_all""")
      .selectExpr("s.n", "s.err_bound", "s.qs").head()
    assert(merged == direct)
    assert(merged.getLong(0) == 300L && merged.getLong(1) == 0L)
  }

  test("graft_bloom_bits from SQL ≡ Layout.bloomBits and hand-computed " +
       "positions; m_bits/k must be literals") {
    // "7" → h1 = h2 = 55; bits (55 + i·56) mod 4096 = 55, 111, 167
    val one = spark.sql("SELECT graft_bloom_bits('7', 4096, 3) AS b")
      .selectExpr("b[0]", "b[1]", "b[2]").head()
    assert(one.getLong(0) == 55L && one.getLong(1) == 111L &&
           one.getLong(2) == 167L)
    docsView()
    val viaSql = spark.sql("""
      SELECT doc_id, graft_bloom_bits(CAST(doc_id AS STRING), 8192, 3) AS b
      FROM sql_fn_docs""").selectExpr("doc_id", "b")
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    val viaCol = spark.table("sql_fn_docs")
      .select(col("doc_id"),
        graft.operators.Layout.bloomBits(
          col("doc_id").cast("string"), 8192, 3).as("b"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    val bad = intercept[Exception] {
      spark.sql(
        "SELECT graft_bloom_bits('x', 4096, CAST(doc_id AS INT)) FROM sql_fn_docs")
        .collect()
    }
    assert(bad.getMessage.contains("graft_bloom_bits"))
  }
}
