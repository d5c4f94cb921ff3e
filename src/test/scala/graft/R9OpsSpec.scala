package graft

import org.apache.spark.sql.functions.{concat, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Multimodal, TextAnalysis}

/** Hand-computed cases for the round-9 wave: Mann-Kendall + Sen
  * slope, Benjamini-Hochberg FDR, Fleiss' kappa, χ² token keyness,
  * and the GVID video frame path.
  */
class R9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mannKendall: hand-computed S, tie-corrected var18, Sen slope") {
    // x = [3,1,4,4,5] on days 1..5: S = 7; ties {4,4} -> var18 =
    // 300 - 18 = 282; 180000*36 < 38416*282 -> not significant;
    // slopes sorted [-2000,0,333,500,500,500,1000,1333,1500,3000]
    // -> lower median 500
    val d = Seq((1L, 3L), (2L, 1L), (3L, 4L), (4L, 4L), (5L, 5L))
      .toDF("day", "x")
    val r = Behavior.mannKendall(d, "day", "x")
      .as[(Long, Long, Long, Long, Boolean, Option[Long])].collect()(0)
    assert(r == ((5L, 7L, 282L, 1L, false, Some(500L))))
  }

  test("mannKendall: strict ramp is significant with slope 1000") {
    val d = (1L to 8L).map(i => (i, i)).toDF("day", "x")
    val r = Behavior.mannKendall(d, "day", "x")
      .as[(Long, Long, Long, Long, Boolean, Option[Long])].collect()(0)
    // S = 28, var18 = 8*7*21 = 1176; 180000*729 > 38416*1176
    assert(r == ((8L, 28L, 1176L, 1L, true, Some(1000L))))
  }

  test("mannKendall: single day reads S=0, null slope") {
    val d = Seq((1L, 5L)).toDF("day", "x")
    val r = Behavior.mannKendall(d, "day", "x")
      .as[(Long, Long, Long, Long, Boolean, Option[Long])].collect()(0)
    assert(r == ((1L, 0L, 0L, 0L, false, None)))
  }

  test("mannKendall: maxDays guard fails fast on an oversized calendar") {
    val d = (1L to 50L).map(i => (i, i)).toDF("day", "x")
    val ex = intercept[Exception] {
      Behavior.mannKendall(d, "day", "x", maxDays = 30L).collect()
    }
    assert(ex.getMessage.contains("maxDays=30"), ex.getMessage)
    assert(Behavior.mannKendall(d, "day", "x", maxDays = 50L)
      .collect().length == 1)
  }

  test("bhFdr: hand-computed cutoff at k*=2") {
    // m=4, alpha=50‰: p(k) vs 0.05k/4 -> 0.01<=0.0125 ok,
    // 0.02<=0.025 ok, 0.04>0.0375 no -> cutoff 0.02
    val t = Seq((1L, 10000L), (2L, 20000L), (3L, 40000L), (4L, 500000L))
      .toDF("id", "p")
    val got = Behavior.bhFdr(t, "id", "p").orderBy("test_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 10000L, true), (2L, 20000L, true),
      (3L, 40000L, false), (4L, 500000L, false)))
  }

  test("bhFdr: tied p-values bind at the largest rank among ties") {
    val t = Seq((1L, 10000L), (2L, 10000L), (3L, 600000L)).toDF("id", "p")
    val got = Behavior.bhFdr(t, "id", "p").orderBy("test_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // cum at p=10000 is 2: 3000*10000 <= 50*2*1e6 -> both reject
    assert(got.map(_._3) == Seq(true, true, false))
  }

  test("bhFdr: nothing passes -> nothing rejected") {
    val t = Seq((1L, 900000L)).toDF("id", "p")
    assert(Behavior.bhFdr(t, "id", "p")
      .as[(Long, Long, Boolean)].collect()(0)._3 == false)
  }

  test("fleissKappa: hand-computed two-rater panel, ragged item drops") {
    // items: (A,A), (A,B), (B,B) -> A=4, E=18, kappa = 1/3;
    // item 4 has ONE rating -> dropped by the exact-n contract
    val r = Seq((1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"),
      (4L, "r1", "A"))
      .toDF("item", "rater", "label")
    val got = Behavior.fleissKappa(r, "item", "rater", "label", 2)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()(0)
    assert(got == ((3L, 2L, 2L, Some(6666L), Some(5000L), Some(3333L))))
  }

  test("fleissKappa: unanimous single label reads null kappa") {
    val r = Seq((1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "A")).toDF("item", "rater", "label")
    val got = Behavior.fleissKappa(r, "item", "rater", "label", 2)
      .select("p_bar_permyriad", "kappa_permyriad")
      .as[(Option[Long], Option[Long])].collect()(0)
    assert(got == ((Some(10000L), None)))
  }

  test("tokenKeyness: enriched-only chi2 with hand-computed cells") {
    // g1 'apple apple banana', g2 'banana cherry cherry':
    // banana (a=1) is not enriched in either; apple/cherry chi2 =
    // 1e6*6*36 div (2*4*3*3) = 3e6
    val docs = Seq(("g1", "apple apple banana"),
      ("g2", "banana cherry cherry")).toDF("src", "text")
    val got = TextAnalysis.tokenKeyness(docs, "text", "src",
      topK = 1, minCount = 1L)
      .orderBy("grp").as[(String, String, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("g1", "apple", 2L, 0L, 3000000L),
      ("g2", "cherry", 2L, 0L, 3000000L)))
  }

  test("tokenKeyness: threshold ties all surface (rank <= k convention)") {
    // g1 'x y' -> x and y tie at the k=1 threshold -> both out
    val docs = Seq(("g1", "x y"), ("g2", "z z")).toDF("src", "text")
    val got = TextAnalysis.tokenKeyness(docs, "text", "src",
      topK = 1, minCount = 1L)
    assert(got.filter($"grp" === "g1").count() == 2L)
    assert(got.filter($"grp" === "g2")
      .select("token").as[String].collect().toSeq == Seq("z"))
  }

  test("NfcNormalize: composed and decomposed collapse; ASCII and null " +
       "pass through; stays in codegen") {
    val d = Seq((1L, "café"), (2L, "café"), (3L, "plain"),
      (4L, null)).toDF("id", "t")
    val got = d.select($"id",
      graft.functions.NfcNormalize($"t").as("n")).orderBy("id")
      .as[(Long, Option[String])].collect().toSeq
    assert(got(0)._2 == got(1)._2) // byte-equal after NFC
    assert(got(0)._2 == Some("caf\u00e9"))
    assert(got(2)._2 == Some("plain") && got(3)._2.isEmpty)
    // a LocalTableScan constant-folds the projection away — assert
    // codegen over a range-backed plan instead
    val plan = spark.range(4)
      .select(graft.functions.NfcNormalize(
        concat(lit("café "), $"id".cast("string"))))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    // NfcNormalize is an alias of NormalizeUnicodeExpr — one codegen
    // kernel (TextStats.normalizeUnicode) serves both SQL surfaces
    assert(plan.contains("WholeStageCodegen") &&
      plan.contains("normalizeUnicode"), plan)
  }

  test("videoFrameHashes: real container split + PNG decode, dhash is " +
       "the planted pattern; corrupt containers become error rows") {
    val p0 = Multimodal.scramble64(7L)
    val pats = Seq(p0, p0 ^ 3L, p0 ^ 7L, p0 ^ 15L)
    val good = (1L, Multimodal.syntheticGvid(pats, 128))
    val bad = (2L, Array[Byte]('G', 'V', 'I', 'D', 0, 9, 0, 0))
    val assets = Seq(good, bad).toDF("asset_id", "payload")
    val (frames, errors) = Multimodal.videoFrameHashes(assets, stride = 2)
    val got = frames.orderBy("frame_ix")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 4L, p0), (1L, 2L, 4L, p0 ^ 7L)))
    assert(errors.as[(Long, String)].collect().toSeq.map(_._1) == Seq(2L))
  }

  test("burstiness: hand-computed CV² over per-user gaps") {
    // u1 gaps {10,10}, u2 gap {20} in group g: n=3, S=40, S2=600 ->
    // mean 13333 milli, cv2 = 1e4*(3*600-1600)/1600 = 1250
    val e = Seq((1L, 0L, "g"), (1L, 10L, "g"), (1L, 20L, "g"),
      (2L, 5L, "g"), (2L, 25L, "g")).toDF("user", "ts", "grp")
    val r = Behavior.burstiness(e, "user", "ts", "grp")
      .as[(String, Long, Long, Option[Long])].collect()(0)
    assert(r == (("g", 3L, 13333L, Some(1250L))))
  }

  test("burstiness: clock-regular reads 0, zero gaps read null, " +
       "single-gap groups drop") {
    val e = Seq((1L, 0L, "reg"), (1L, 10L, "reg"), (1L, 20L, "reg"),
      (2L, 5L, "zero"), (2L, 5L, "zero"), (2L, 5L, "zero"),
      (3L, 0L, "one"), (3L, 9L, "one")).toDF("user", "ts", "grp")
    val got = Behavior.burstiness(e, "user", "ts", "grp")
      .orderBy("grp").as[(String, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == Seq(("reg", 2L, 10000L, Some(0L)),
      ("zero", 2L, 0L, None)))
  }

  test("changepointDetect: level shift found at the exact split") {
    // [0,0,0,10,10,10]: split after day 3, score 25e6 (the stated
    // quantized objective)
    val d = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L), (5L, 10L),
      (6L, 10L)).toDF("day", "x")
    val r = Behavior.changepointDetect(d, "day", "x")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
    assert(r == ((6L, Some(3L), Some(25000000L))))
  }

  test("changepointDetect: constant series scores 0 at the first " +
       "split; single day reads null") {
    val c = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("day", "x")
    assert(Behavior.changepointDetect(c, "day", "x")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
      == ((3L, Some(1L), Some(0L))))
    val s = Seq((5L, 3L)).toDF("day", "x")
    assert(Behavior.changepointDetect(s, "day", "x")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
      == ((1L, None, None)))
  }

  test("videoNearDup: shared-frame containment, same-video pairs drop") {
    val p = Multimodal.scramble64(11L)
    val q = Multimodal.scramble64(77L) // independent video
    // video 1: frames {p, p^255, q'}; video 2 shares exactly 2 of 3
    val v1 = Multimodal.syntheticGvid(Seq(p, p ^ 255L, q ^ 255L), 128)
    val v2 = Multimodal.syntheticGvid(Seq(p, p ^ 255L, q), 168)
    val assets = Seq((1L, v1), (2L, v2)).toDF("asset_id", "payload")
    val (frames, _) = Multimodal.videoFrameHashes(assets, stride = 1)
    val got = Multimodal.videoNearDup(frames, maxHamming = 0,
        minSharedPermille = 500L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // 2 of video 1's 3 frames appear in video 2 -> containment 666
    assert(got == Seq((1L, 2L, 2L, 3L, 666L)))
    // a 700‰ threshold kills the pair
    assert(Multimodal.videoNearDup(frames, maxHamming = 0,
      minSharedPermille = 700L).count() == 0L)
  }

  test("featurizeGvidFrames + featurize: real first-frame decode for " +
       "GVID video assets") {
    val p = Multimodal.scramble64(3L)
    val gvid = Multimodal.syntheticGvid(Seq(p, p ^ 1L, p ^ 3L), 128)
    val assets = Seq((4L, gvid)).toDF("asset_id", "payload")
    val feats = Multimodal.featurizeGvidFrames(assets, stride = 2)
      .orderBy("frame_ix")
      .select("asset_id", "frame_ix").as[(Long, Long)].collect().toSeq
    assert(feats == Seq((4L, 0L), (4L, 2L)))
    // the featurize router takes the REAL path for video+GVID: the
    // 9x8 synthetic frame's width/height land in features[0..1]
    val viaRouter = Multimodal.featurize(
        Seq((4L, "video", gvid)).toDF("asset_id", "kind", "payload")
          .withColumn("meta", org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.lit(9).as("width"))))
      .select("features").as[Seq[Float]].collect()(0)
    assert(viaRouter(0) == 9.0f && viaRouter(1) == 8.0f)
  }

  test("videoFrameDrift: hamming to the first sampled frame") {
    val p0 = Multimodal.scramble64(9L)
    // frame f flips the low f bits -> drift = f at stride 1
    val pats = (0 until 4).map(f => p0 ^ ((1L << f) - 1L))
    val assets = Seq((5L, Multimodal.syntheticGvid(pats, 100)))
      .toDF("asset_id", "payload")
    val (frames, _) = Multimodal.videoFrameHashes(assets, stride = 1)
    val got = Multimodal.videoFrameDrift(frames).orderBy("frame_ix")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == (0L to 3L).map(f => (5L, f, 4L, f)))
  }
}
