package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich-style
  * word-internal BPE) — the real-tokenizer upgrade of the E10 BPE-ish
  * regex count.
  *
  * Scale shape (the Lloyd/codebook pattern): the only corpus-scale
  * work is ONE distributed word-frequency aggregation; the merge loop
  * then runs on the model-sized word-shape table (distinct words ×
  * counts — vocabulary-bounded, like centroids or LM tables, NOT
  * corpus-bounded), and encoding ships the learned ranks back through
  * a native codegen expression. Training never iterates over the
  * corpus.
  */
object Bpe {

  /** One trained merge: the adjacent symbol pair and its rank. */
  final case class Merge(left: String, right: String, rank: Int)

  /** Distributed word-frequency table: (word, n) — the corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Bound the word-shape table BEFORE it reaches the driver: drop
    * words rarer than `minCount`, then keep the `maxWords` most
    * frequent (count desc, word asc — deterministic). The sort+limit
    * plans as TakeOrderedAndProject (per-task heaps, driver merges
    * partitions·maxWords), so an open 100 TB vocabulary can never
    * blow up the collect — the standard subword-trainer practice
    * (rare words contribute ~nothing to merge/EM statistics).
    */
  private[graft] def boundedWordCounts(docs: DataFrame, textCol: String,
                                       minCount: Long,
                                       maxWords: Int): DataFrame =
    wordCounts(docs, textCol)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)

  /** Train `numMerges` BPE merges from a (word, n) frequency table.
    * Words start as character sequences with an end-of-word marker on
    * the last symbol; each round merges the most frequent adjacent
    * pair (ties → lexicographically smallest pair, so training is
    * deterministic on any engine or layout). The table is model-sized,
    * so the loop is a driver computation — the same contract as the
    * k-means/codebook trainers.
    */
  def trainMerges(wordFreqs: DataFrame, numMerges: Int): Seq[Merge] = {
    val words: Array[(Array[String], Long)] = wordFreqs
      .select(col("word"), col("n").cast("long"))
      .collect()
      .map(r => (symbols(r.getString(0)), r.getLong(1)))
    val merges = Seq.newBuilder[Merge]
    var current = words
    var rank = 0
    while (rank < numMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      current.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) return merges.result()
      val ((l, r), _) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      merges += Merge(l, r, rank)
      current = current.map { case (syms, n) => (applyMerge(syms, l, r), n) }
      rank += 1
    }
    merges.result()
  }

  /** Train directly from a document corpus. `minCount`/`maxWords`
    * bound the driver-side word-shape table (see
    * [[boundedWordCounts]]) — at the defaults the cap is far above
    * any test corpus and binds only on open web-scale vocabularies.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 1L, maxWords: Int = 1000000): Seq[Merge] =
    trainMerges(boundedWordCounts(docs, textCol, minCount, maxWords),
      numMerges)

  /** Persist a trained merge table (train once, encode everywhere —
    * the model-artifact lifecycle of the IVF centroids/LM tables).
    */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], dir: String): Unit = {
    import spark.implicits._
    merges.toDF("left", "right", "rank")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a persisted merge table, rank-ordered. */
  def loadMerges(spark: SparkSession, dir: String): Seq[Merge] =
    spark.read.parquet(dir)
      .select(col("left"), col("right"), col("rank").cast("int"))
      .collect()
      .map(r => Merge(r.getString(0), r.getString(1), r.getInt(2)))
      .sortBy(_.rank).toSeq

  /** Initial symbol sequence of a word: one symbol per character, the
    * last carrying the end-of-word marker `</w>`.
    */
  private[graft] def symbols(word: String): Array[String] = {
    val cs = word.toCharArray.map(_.toString)
    if (cs.nonEmpty) cs(cs.length - 1) = cs(cs.length - 1) + "</w>"
    cs
  }

  private[graft] def applyMerge(syms: Array[String], l: String,
                                    r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with trained merges: repeatedly apply the
    * lowest-rank applicable merge (the standard BPE encode order —
    * training order, not position order).
    */
  private[graft] def encodeWord(word: String,
                                    ranks: java.util.HashMap[String, Integer])
      : Array[String] = {
    var syms = symbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIx = i
        }
        i += 1
      }
      if (bestIx < 0) done = true
      else syms = applyMerge(syms, syms(bestIx), syms(bestIx + 1))
    }
    syms
  }

  /** BPE-encode a text column: `array<string>` of subword tokens
    * (native codegen expression; the merge table rides as a reference
    * object — see [[graft.functions.BpeEncodeExpr]]).
    */
  def encode(text: org.apache.spark.sql.Column,
             merges: Seq[Merge]): org.apache.spark.sql.Column =
    graft.functions.BpeEncodeExpr(text, merges.map(m => (m.left, m.right, m.rank)))

  /** E67: per-language tokenizer evaluation under a learned merge
    * table — FERTILITY (subwords per word, integer permille) and mean
    * emitted-symbol length (milli-chars, `</w>` markers counted as
    * written): the "does this vocabulary fit each language slice"
    * report a multilingual corpus runs before committing to a
    * tokenizer. One encode pass (map-side native expression) + one
    * language-keyed aggregation; ratios are truncating integer
    * division on non-negative operands (engine-exact; the dynamic
    * oracle re-runs the embedded merge chain and the same algebra).
    * Languages with zero words are dropped (a ratio over nothing).
    */
  def tokenizerStats(docs: org.apache.spark.sql.DataFrame, langCol: String,
                     textCol: String, merges: Seq[Merge])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.withColumn("__t", Bpe.encode(col(textCol), merges))
      .select(col(langCol).as("lang"),
        size(filter(split(trim(col(textCol)), "\\s+"),
          w => length(w) > 0)).cast("long").as("__w"),
        size(col("__t")).cast("long").as("__s"),
        expr("aggregate(__t, 0L, (acc, x) -> acc + CAST(length(x) AS LONG))")
          .as("__ch"))
      .groupBy("lang")
      .agg(sum("__w").as("n_words"), sum("__s").as("n_subwords"),
           sum("__ch").as("n_subword_chars"))
      .filter(col("n_words") > 0)
      .withColumn("fertility_permille",
        expr("n_subwords * 1000L div n_words"))
      .withColumn("chars_per_subword_milli",
        expr("n_subword_chars * 1000L div n_subwords"))
  }
}
