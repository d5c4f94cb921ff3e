package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}
import graft.sources.Tables

/** Round-8 advice/verdict fixes: tCloseness null-category TVD, the
  * bitextMineAnn cached-count knob, and the dynamic-oracle artifact
  * side-file branch.
  */
class R8FixesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------ tCloseness null handling

  test("tCloseness: null sensitive values are their own category") {
    // hand-computed: N=10, global x:2 y:4 null:4;
    // group A (n=4, x:2 null:2): TVD = 500*(12+4+16)/40 = 400
    // group B (n=6, y:4 null:2): TVD = 500*(12+4+16)/60 = 266
    // (the pre-fix inner join dropped the null cells from the
    // numerator while their rows still counted in n_rows/N and the
    // null mass read as absent-from-group: A would report 550)
    val df = Seq(
      ("A", Option("x")), ("A", Option("x")),
      ("A", Option.empty[String]), ("A", Option.empty[String]),
      ("B", Option("y")), ("B", Option("y")),
      ("B", Option("y")), ("B", Option("y")),
      ("B", Option.empty[String]), ("B", Option.empty[String])
    ).toDF("g", "s")
    val out = Relational.tCloseness(df, Seq("g"), "s", tPermille = 300)
      .select("g", "n_rows", "tvd_permille", "breach")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(out === Array(("A", 4L, 400L, true), ("B", 6L, 266L, false)))
  }

  test("tCloseness: no-null frames are unchanged by the sentinel") {
    val df = Seq(("A", "x"), ("A", "y"), ("B", "x")).toDF("g", "s")
    // group A (n=2, x:1 y:1) vs global x:2 y:1 N=3:
    //   x: |1*3-2*2|=1, y: |1*3-1*2|=1 → 500*2/6 = 166
    // group B (n=1, x:1): x: |1*3-2*1|=1, y absent: 1*1=1 → 500*2/3=333
    val out = Relational.tCloseness(df, Seq("g"), "s", tPermille = 200)
      .select("g", "tvd_permille").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out === Array(("A", 166L), ("B", 333L)))
  }

  // ------------------------------------ bitextMineAnn cached-count knob

  test("bitextMineAnn: provided srcN/tgtN reproduce the default result") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val src = e.filter(col("vec_id") % 2 === 0)
    val tgt = e.filter(col("vec_id") % 2 === 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("src_id", "tgt_id", "margin_permille").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val base = rows(Similarity.bitextMineAnn(src, tgt, "vec_id",
      "embedding", k = 4, ratePermille = 50))
    val knob = rows(Similarity.bitextMineAnn(src, tgt, "vec_id",
      "embedding", k = 4, ratePermille = 50,
      srcN = src.count(), tgtN = tgt.count()))
    assert(base.nonEmpty && base === knob)
  }

  // ------------------------- dynamic-oracle artifact side-file branch

  test("over-cap index artifacts go to a parquet side file the SQL reads") {
    val artDir = java.nio.file.Files
      .createTempDirectory("graft_art_test").toString
    val prev = sys.props.get("graft.oracle.embedCap")
    sys.props("graft.oracle.embedCap") = "1"
    try {
      val sql = DynamicOracles.knnOutliers(
        spark, "/root/testdata/sf0.001", artDir)
      assert(sql.contains(s"read_parquet('$artDir/knn_outliers_kc/"))
      assert(!sql.contains("VALUES ("))
      val files = new java.io.File(s"$artDir/knn_outliers_kc")
        .listFiles((_, n) => n.endsWith(".parquet"))
      assert(files != null && files.nonEmpty)
      // the side file holds exactly the frame the VALUES branch embeds
      val back = spark.read.parquet(s"$artDir/knn_outliers_kc")
      assert(back.columns.toSeq === Seq("vec_id", "kth"))
      assert(back.count() > 1)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.oracle.embedCap") = v
        case None => sys.props -= "graft.oracle.embedCap"
      }
    }
  }

  test("under-cap index artifacts still embed as VALUES literals") {
    val sql = DynamicOracles.knnOutliers(spark, "/root/testdata/sf0.001")
    assert(sql.contains("kc(vec_id, kth) AS (VALUES"))
    assert(!sql.contains("read_parquet"))
  }

  // ------------------------------------------ audio fingerprint (E90b)

  test("syntheticFingerprintWav: fingerprint round-trips the pattern " +
       "exactly; flipped bits -> exact hamming; re-gained copy " +
       "fingerprints identically on distinct bytes") {
    import graft.operators.Multimodal
    val pats = Seq(0L, -1L, 0x123456789ABCDEFL,
      Multimodal.scramble64(7L), Multimodal.scramble64(-3L))
    for (p <- pats; base <- Seq(0, 1000, 32000)) {
      assert(Multimodal.audioFingerprint(
        Multimodal.syntheticFingerprintWav(p, base)) == p,
        s"pattern $p amp $base")
    }
    val p = Multimodal.scramble64(42L)
    val a = Multimodal.syntheticFingerprintWav(p, 1000)
    val b = Multimodal.syntheticFingerprintWav(
      p ^ (1L << 5) ^ (1L << 21) ^ (1L << 47), 1000)
    assert(java.lang.Long.bitCount(
      Multimodal.audioFingerprint(a) ^ Multimodal.audioFingerprint(b)) == 3)
    val regained = Multimodal.syntheticFingerprintWav(p, 2000)
    assert(!java.util.Arrays.equals(a, regained))
    assert(Multimodal.audioFingerprint(regained) ==
      Multimodal.audioFingerprint(a))
  }

  test("audioNearDup: planted pair found; undecodable and too-short " +
       "payloads become error rows") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.Row
    val p = Multimodal.scramble64(11L)
    val orig = Multimodal.syntheticFingerprintWav(p, 1000)
    val near = Multimodal.syntheticFingerprintWav(p ^ (1L << 21), 2000)
    val far = Multimodal.syntheticFingerprintWav(Multimodal.scramble64(12L), 1000)
    // 64-frame clip: decodes but has no 65-segment grid
    val short = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](128)), fmt, 64L)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val rows = Seq(
      Row(1L, "audio", orig, null), Row(2L, "audio", near, null),
      Row(3L, "audio", far, null),
      Row(4L, "audio", "not audio".getBytes("UTF-8"), null),
      Row(5L, "audio", short, null))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.AssetSchema)
    val (pairs, errors) = Multimodal.audioNearDup(assets, maxHamming = 3)
    assert(pairs.select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet == Set((1L, 2L, 1L)))
    assert(errors.select("asset_id").as[Long].collect().toSet ==
      Set(4L, 5L))
  }
}
