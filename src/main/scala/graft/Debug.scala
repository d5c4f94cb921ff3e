package graft

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Current experiment (round 4): ANN recall@10 vs knob settings on the
  * sf0.01 embedding corpus — a NEAR-UNIFORM random-vector corpus, i.e.
  * the ANN worst case (cosine gaps between true and false neighbors
  * are tiny, so any method that prunes the scan loses recall). The
  * sweep quantifies the recall ↔ scan-fraction tradeoff to pick
  * defaults and spec floors; numbers recorded in SURVEY §5.
  *
  * Previous experiment (round 3, kept for the record): webhook
  * envelope parse — plain parse ~1.9s vs ~4.4s behind an explode
  * barrier at sf0.1; WebhookIngest.parse uses OncePerRowExpr instead.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .persist()
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.annBruteForce(emb, queries, "vec_id", "embedding",
      k = 10).persist()
    println(s"[dbg] corpus=${emb.count()} queries=50 ground-truth rows=${exact.count()}")

    for (nprobe <- Seq(2, 4, 8, 16, 32)) {
      val ivf = Similarity.annIvf(emb, queries, "vec_id", "embedding",
        k = 10, nlist = 32, nprobe = nprobe, lloydIters = 2)
      val r = Similarity.recallAtK(ivf, exact)
      println(f"[dbg] ivf nlist=32 nprobe=$nprobe%-2d scan=${nprobe / 32.0}%.3f recall@10=$r%.4f")
    }
    for ((tables, bits) <- Seq((8, 8), (16, 8), (8, 6), (16, 6), (32, 6), (16, 4))) {
      val lsh = Similarity.annLsh(emb, queries, "vec_id", "embedding",
        dim = 64, k = 10, tables = tables, bits = bits)
      val r = Similarity.recallAtK(lsh, exact)
      println(f"[dbg] lsh tables=$tables%-2d bits=$bits recall@10=$r%.4f")
    }
    spark.stop()
  }
}
