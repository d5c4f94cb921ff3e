package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Unigram-LM subword tokenizer (Kudo/SentencePiece-style) — the
  * probabilistic sibling of [[Bpe]]: instead of greedy merges, a
  * piece vocabulary is EM-fit so each word's best segmentation
  * maximizes Σ ln p(piece), and encoding is Viterbi.
  *
  * Same scale contract as BPE/Lloyd/codebook training: the ONLY
  * corpus-scale work is the ONE distributed word-frequency pass
  * ([[Bpe.wordCounts]]); seeding, EM, pruning, and scoring all run on
  * the model-sized distinct-word table on the driver, and encoding
  * ships the final piece table back through a native codegen
  * expression ([[graft.functions.UnigramEncodeExpr]]).
  *
  * Deterministic variant of the SentencePiece trainer: counts are
  * exact integers (HashMap accumulation commutes, so any collect
  * order gives the same table), piece scores are ln(count/total)
  * quantized to integer micro-nats, Viterbi compares integer sums
  * with a fixed tie rule (longest final piece wins), and pruning
  * selects by (count desc, piece asc). Fit is bit-identical across
  * partition layouts and engines. Simplifications vs the paper,
  * documented: count-based pruning instead of loss-based, no ▁
  * word-boundary marker (words segment independently), required
  * single-char pieces floored at count 1 instead of carrying a
  * smoothed residual probability.
  */
object Unigram {

  /** One vocabulary entry: the piece and ln p in micro-nats. */
  final case class Piece(piece: String, scoreMicro: Long)

  /** Score a raw char that is not in the vocabulary (unk). */
  val UnkScoreMicro: Long = -20000000L

  /** Train from a document corpus: one corpus pass, then driver EM.
    * `minCount`/`maxWords` bound the driver-side word-shape table
    * ([[Bpe.boundedWordCounts]] — TakeOrderedAndProject, so an open
    * 100 TB vocabulary can never blow up the collect).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, emIters: Int = 4,
            seedSize: Int = 2000, minCount: Long = 1L,
            maxWords: Int = 1000000): Seq[Piece] =
    trainFromCounts(Bpe.boundedWordCounts(docs, textCol, minCount, maxWords),
      vocabSize, maxPieceLen, emIters, seedSize)

  /** Persist a trained piece table (train once, encode everywhere). */
  def savePieces(spark: org.apache.spark.sql.SparkSession,
                 pieces: Seq[Piece], dir: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "score_micro")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a persisted piece table, piece-ordered. */
  def loadPieces(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[Piece] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(dir)
      .select(col("piece"), col("score_micro").cast("long"))
      .collect()
      .map(r => Piece(r.getString(0), r.getLong(1)))
      .sortBy(_.piece).toSeq
  }

  /** EM fit over a (word, n) frequency table (model-sized). */
  def trainFromCounts(wordFreqs: DataFrame, vocabSize: Int,
                      maxPieceLen: Int, emIters: Int,
                      seedSize: Int): Seq[Piece] = {
    require(vocabSize > 0 && maxPieceLen >= 1 && emIters >= 1)
    import org.apache.spark.sql.functions.col
    val words: Array[(String, Long)] = wordFreqs
      .select(col("word"), col("n").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // required pieces: every single character that occurs
    val chars = collection.mutable.SortedSet.empty[String]
    words.foreach { case (w, _) => w.foreach(c => chars += c.toString) }

    // seed: frequency-weighted substring counts, top seedSize
    val seed = collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          seed(s) = seed.getOrElse(s, 0L) + n
          l += 1
        }
        i += 1
      }
    }
    var vocab: Map[String, Long] = selectTop(seed.toSeq, seedSize, chars)

    var iter = 0
    while (iter < emIters) {
      val scores = toScores(vocab)
      val counts = collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, n) =>
        val segs = segmentWord(w, scores, maxPieceLen)
        var i = 0
        while (i < segs.length) {
          counts(segs(i)) = counts.getOrElse(segs(i), 0L) + n
          i += 1
        }
      }
      vocab = selectTop(counts.toSeq.filter(_._2 > 0), vocabSize, chars)
      iter += 1
    }

    val scores = toScores(vocab)
    vocab.keysIterator.toSeq.sorted
      .map(p => Piece(p, scores.get(p)))
  }

  /** Keep the top `limit` pieces by (count desc, piece asc), plus
    * every required single char (floored at count 1 so its ln stays
    * finite).
    */
  private def selectTop(counts: Seq[(String, Long)], limit: Int,
                        chars: collection.Set[String]): Map[String, Long] = {
    val top = counts
      .sortBy { case (p, c) => (-c, p) }
      .take(limit)
    val m = collection.mutable.Map[String, Long](top: _*)
    chars.foreach { c =>
      val cur = m.getOrElse(c, 0L)
      if (cur < 1L) m(c) = 1L
    }
    m.toMap
  }

  /** ln(count/total) in integer micro-nats, per piece. */
  private[graft] def toScores(vocab: Map[String, Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val total = vocab.valuesIterator.sum.toDouble
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) =>
      m.put(p, java.lang.Long.valueOf(
        Math.round(1e6 * math.log(c.toDouble / total))))
    }
    m
  }

  /** Viterbi segmentation maximizing the integer micro-nat score sum.
    * dp over end positions; candidate last pieces scan start j
    * ascending with a STRICT improvement rule, so on ties the
    * smallest j — the LONGEST final piece — wins (deterministic).
    * Unknown single chars segment as themselves at [[UnkScoreMicro]].
    */
  private[graft] def segmentWord(word: String,
                                 scores: java.util.HashMap[String, java.lang.Long],
                                 maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val dp = new Array[Long](n + 1)
    val prev = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Long.MinValue)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dp(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val s: java.lang.Long = scores.get(piece)
          val sc =
            if (s != null) s.longValue()
            else if (i - j == 1) UnkScoreMicro
            else Long.MinValue
          if (sc != Long.MinValue && dp(j) + sc > dp(i)) {
            dp(i) = dp(j) + sc
            prev(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    val out = collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      out += word.substring(prev(p), p)
      p = prev(p)
    }
    out.reverseIterator.toArray
  }

  /** Viterbi-encode a text column: `array<string>` of pieces (native
    * codegen expression; piece scores ride as a reference object).
    */
  def encode(text: Column, pieces: Seq[Piece],
             maxPieceLen: Int = 6): Column =
    graft.functions.UnigramEncodeExpr(text,
      pieces.map(p => (p.piece, p.scoreMicro)), maxPieceLen)
}
