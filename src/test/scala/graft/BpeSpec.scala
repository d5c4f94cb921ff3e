package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE tokenizer training/encoding: hand-computed merge sequence,
  * encode consistency, determinism on the sf corpus.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("trainMerges: hand-computed sequence with frequency and tie rules") {
    // {aaab ×3, aab ×2}:
    //   round 1: (a,a) appears 2·3 + 1·2 = 8 — wins
    //   round 2: (aa,a)=3 ties (a,b</w>)=3+2=... → after merge 1 the
    //   words are [aa,a,b</w>]×3 and [aa,b</w>]×2, so (aa,a)=3,
    //   (a,b</w>)=3, (aa,b</w>)=2 — tie broken lexicographically:
    //   ("a","b</w>") < ("aa","a")
    //   round 3: [aa,ab</w>]×3 → (aa,ab</w>) (count 3 beats (aa,b</w>)=2)
    //   round 4: only [aa,b</w>]×2 still has a pair → (aa,b</w>)
    //   round 5: every word is a single symbol → training stops early
    val freqs = Seq(("aaab", 3L), ("aab", 2L)).toDF("word", "n")
    val merges = Bpe.trainMerges(freqs, numMerges = 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(
      ("a", "a"), ("a", "b</w>"), ("aa", "ab</w>"), ("aa", "b</w>")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("encode applies merges in rank order; unseen pairs stay split") {
    val merges = Seq(Bpe.Merge("a", "a", 0), Bpe.Merge("a", "b</w>", 1),
      Bpe.Merge("aa", "ab</w>", 2))
    val out = Seq((1L, "aaab aab ba x")).toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(out == Seq("aaab</w>", "aa", "b</w>", "b", "a</w>", "x</w>"))
  }

  test("maxWords cap binds deterministically; merge table round-trips") {
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    // cap to the top-2 words (aa×3, bb×2): 'cc' never reaches training,
    // so no merge involving c can exist
    val capped = Bpe.train(docs, "text", numMerges = 10, maxWords = 2)
    assert(capped.nonEmpty)
    assert(!capped.exists(m => m.left.contains("c") || m.right.contains("c")))
    // minCount floor drops singletons the same way
    val floored = Bpe.train(docs, "text", numMerges = 10, minCount = 2L)
    assert(!floored.exists(m => m.left.contains("c") || m.right.contains("c")))
    // persist → reload is identity
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.saveMerges(spark, capped, dir + "/m")
    assert(Bpe.loadMerges(spark, dir + "/m") == capped)
  }

  test("training is deterministic and compresses the sf corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.train(docs, "text", numMerges = 100)
    val m2 = Bpe.train(docs, "text", numMerges = 100)
    assert(m1 == m2, "BPE training must be deterministic")
    // the synthetic corpus has a small closed vocabulary, so training
    // may exhaust every adjacent pair before the merge budget
    assert(m1.size > 50 && m1.size <= 100, s"got ${m1.size} merges")
    val stats = docs.select(
        size(Bpe.encode(col("text"), m1)).cast("long").as("subwords"),
        size(filter(split(trim(col("text")), "\\s+"),
          w => length(w) > 0)).cast("long").as("words"),
        length(col("text")).cast("long").as("chars"))
      .agg(sum($"subwords"), sum($"words"), sum($"chars"))
      .as[(Long, Long, Long)].head()
    val (subwords, words, chars) = stats
    // more tokens than words (subword splits) but far fewer than chars
    // (the merges actually fused frequent sequences)
    assert(subwords >= words, s"subwords=$subwords words=$words")
    assert(subwords < chars / 2, s"subwords=$subwords chars=$chars")
  }

  test("tokenizerStats: hand-computed fertility and symbol-length " +
       "ratios per language; zero-word languages dropped") {
    // corpus: words "ab" (x2), "b", "a" -> the single merge fuses
    // ("a","b</w>") so "ab" encodes as ONE symbol "ab</w>" (6 chars),
    // "a"/"b" stay single symbols "a</w>"/"b</w>" (5 chars each)
    val docs = Seq(("aa", "ab ab"), ("bb", "b a"), ("cc", "  "))
      .toDF("lang", "text")
    val merges = Bpe.train(docs, "text", numMerges = 1)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b</w>")))
    val got = Bpe.tokenizerStats(docs, "lang", "text", merges)
      .orderBy("lang")
      .select("lang", "n_words", "n_subwords", "n_subword_chars",
              "fertility_permille", "chars_per_subword_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // aa: 2 words -> 2 symbols, 12 chars -> fertility 1000, cps 6000
    // bb: 2 words -> 2 symbols ("b</w>","a</w>"), 10 chars -> cps 5000
    // cc: whitespace-only -> zero words -> dropped
    assert(got == Seq(("aa", 2L, 2L, 12L, 1000L, 6000L),
                      ("bb", 2L, 2L, 10L, 1000L, 5000L)))
  }
}
