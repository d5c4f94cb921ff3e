package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text retrieval over the corpus — the search-side counterpart of the
  * E-group's indexing/dedup operators.
  */
object Retrieval {

  /** BM25 ranking of the corpus against a bag of query terms
    * (Robertson/Okapi, Lucene's positive idf variant):
    * score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl)).
    *
    * Cross-engine determinism discipline (the tfidf/perplexity
    * pattern): `ln` runs once per TERM (model-sized) and is quantized
    * to integer micro-units there — the only libm call leaves the
    * plan immediately; every per-(doc, term) factor after that is
    * IEEE-deterministic arithmetic on integer tf/dl and the two fixed
    * constants, the per-term contribution rounds to integer
    * micro-units, and the per-doc score is an exact INTEGER sum (no
    * fp summation-order dependence through the shuffle).
    *
    * Scale shape: document lengths are map-side (`size(split)`), only
    * tokens MATCHING the broadcast query explode into the tf
    * aggregation, df derives from the tf frame (no second corpus
    * pass), idf broadcasts back, and the final top-k is
    * orderBy+limit → TakeOrderedAndProject (per-task heaps, no global
    * sort).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withDl = docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(filter(col("__toks"), w => length(w) > 0)).cast("long").as("dl"))
    val stats = withDl.agg(count(lit(1)).as("n"), sum(col("dl")).as("len"))
      .head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val q = queryTerms.toDF("term")
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(q), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        round(log(lit(1.0) +
            (lit(nDocs).cast("double") - col("df") + 0.5) / (col("df") + 0.5))
          * 1e6).cast("long").as("idf_micro"))
    tf.join(broadcast(idf), "term")
      .withColumn("c_micro",
        round(col("idf_micro") * (col("tf") * (k1 + 1)) /
              (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
          .cast("long"))
      .groupBy("doc_id").agg(sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(topK)
  }
}
