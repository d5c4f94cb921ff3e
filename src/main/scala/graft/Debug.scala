package graft

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Current experiment (round 4b): PQ ANN recall@10 vs (m, ksub,
  * rerank) on the sf0.01 embedding corpus — a NEAR-UNIFORM
  * random-vector corpus, the ANN worst case. The sweep picks the
  * ann_pq defaults and the spec floor; numbers recorded in SURVEY §5.
  *
  * Previous experiments (kept for the record):
  * - r4 ANN knob sweep: IVF nprobe 2/4/8/16/32 of nlist=32 →
  *   0.35/0.47/0.64/0.84/1.00; LSH (tables×bits) 8×8 → 0.13,
  *   16×8 → 0.23, 16×6 → 0.53, 32×6 → 0.75, 16×4 → 0.90.
  * - r4 webhook parse: plain-extraction SharedExpr 3.47s vs
  *   OncePerRowExpr barrier 4.31s over 600k payloads, but
  *   RuntimeReplaceable consumers (parseDateStr/upper) die in
  *   RewriteWithExpression (nested-With CommonExpressionId orphan),
  *   so the production route keeps the barrier.
  * - r3 webhook envelope parse: plain ~1.9s vs ~4.4s behind an
  *   explode barrier at sf0.1 → OncePerRowExpr.
  * - r4 dedup_clusters sf0.1 min-of-3 across sessions: 4.12/4.48/
  *   4.64s minima — r3's 6.53 was host variance, no regression.
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

    for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 16), (16, 64), (32, 16));
         rerank <- Seq(32, 64, 128)) {
      val t0 = System.nanoTime()
      val r = Similarity.recallAtK(
        Similarity.annPq(emb, queries, "vec_id", "embedding",
          k = 10, m = m, ksub = ksub, lloydIters = 2, rerank = rerank), exact)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dbg] pq m=$m%-2d ksub=$ksub%-3d rerank=$rerank%-3d recall@10=$r%.4f  ($s%.1fs)")
    }
    spark.stop()
  }
}
