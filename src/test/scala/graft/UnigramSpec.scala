package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram-LM tokenizer: hand-computed EM fixpoint, Viterbi tie rule,
  * unknown-char handling, determinism on the sf corpus.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("EM reaches the hand-computed vocabulary and scores on {abab×4}") {
    // seed counts: a=8 b=8 ab=8 ba=4 aba=4 bab=4 abab=4 (total 40);
    // Viterbi picks [abab] (one piece, ln .1 beats any split), so the
    // E-step keeps only abab + the char floor {a:1, b:1} — a fixpoint.
    val docs = Seq((1L, "abab abab abab abab")).toDF("doc_id", "text")
    val pieces = Unigram.train(docs, "text", vocabSize = 10,
      maxPieceLen = 6, emIters = 3, seedSize = 100)
    assert(pieces.map(_.piece) == Seq("a", "abab", "b"))
    val byPiece = pieces.map(p => p.piece -> p.scoreMicro).toMap
    assert(byPiece("abab") == Math.round(1e6 * math.log(4.0 / 6.0)))
    assert(byPiece("a") == Math.round(1e6 * math.log(1.0 / 6.0)))
  }

  test("encode: Viterbi segmentation, unknown chars become unk-scored singles") {
    val docs = Seq((1L, "abab abab abab abab")).toDF("doc_id", "text")
    val pieces = Unigram.train(docs, "text", vocabSize = 10,
      maxPieceLen = 6, emIters = 3, seedSize = 100)
    val out = Seq((1L, "abab aba x")).toDF("id", "text")
      .select(Unigram.encode(col("text"), pieces).as("p"))
      .as[Seq[String]].head()
    // "aba" has no 'ab' piece left → chars; "x" was never seen → unk single
    assert(out == Seq("abab", "a", "b", "a", "x"))
  }

  test("tie rule: equal-score segmentations resolve to the longest final piece") {
    val scores = graft.functions.UnigramEncodeExpr.scoreTable(
      Seq(("a", -100L), ("b", -100L), ("ab", -200L)))
    // [ab] and [a,b] both score -200 → longest final piece wins
    assert(Unigram.segmentWord("ab", scores, 6).toSeq == Seq("ab"))
  }

  test("piece table round-trips through parquet") {
    val docs = Seq((1L, "abab abab abab abab")).toDF("doc_id", "text")
    val pieces = Unigram.train(docs, "text", vocabSize = 10,
      maxPieceLen = 6, emIters = 3, seedSize = 100)
    val dir = java.nio.file.Files.createTempDirectory("unigram_model").toString
    Unigram.savePieces(spark, pieces, dir + "/p")
    assert(Unigram.loadPieces(spark, dir + "/p") == pieces)
  }

  test("training is deterministic across partition layouts and compresses") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p1 = Unigram.train(docs.repartition(1), "text", vocabSize = 40)
    val p7 = Unigram.train(docs.repartition(7), "text", vocabSize = 40)
    assert(p1 == p7, "unigram training must be layout-independent")
    val stats = docs.select(
        size(Unigram.encode(col("text"), p1)).cast("long").as("pieces"),
        length(col("text")).cast("long").as("chars"))
      .agg(sum($"pieces"), sum($"chars")).as[(Long, Long)].head()
    assert(stats._1 < stats._2 / 2,
      s"pieces=${stats._1} should be far fewer than chars=${stats._2}")
  }
}
