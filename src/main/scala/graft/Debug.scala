package graft

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Round-5 measurements (for the record; sf0.1 local[32] min-of-2):
  * - lang_id window argmax → min(struct) hash agg: 7.2s → 1.2s.
  * - ANN top-k windows → GroupedTopKAgg heaps: family re-verified
  *   bit-identical; ann family totals unchanged locally (the shuffle
  *   elimination is the at-scale win, not a local[32] one).
  * - mutual_knn: BNLJ join-row materialization dominated (not cosine
  *   math) — annBruteForceBlocked (per-partition heaps, no join rows)
  *   8.3s → 3.4s with bit-identical output.
  * - Full bench: 141.1s / 112 keys (round start) → ~113s / 122 keys.
  *
  * Previous experiment (round 4c): publish_split_item spiked 10s → 64s
  * (min-of-2) in the latest sf0.1 bench — isolate whether that is the
  * shared publish-corpus materialization landing on a different key
  * (Map iteration order moves as keys are added), a real regression,
  * or host noise.
  *
  * Previous experiments (kept for the record):
  * - r4b PQ sweep (sf0.01, recall@10): m8/k16 rerank 32/64/128 →
  *   0.57/0.75/0.89; m16/k16 → 0.78/0.89/0.98; m16/k64 →
  *   0.93/0.996/1.00; m32/k16 → 0.95/0.998/1.00.
  * - r4 ANN knob sweep: IVF nprobe 2/4/8/16/32 of nlist=32 →
  *   0.35/0.47/0.64/0.84/1.00; LSH (tables×bits) 8×8 → 0.13,
  *   16×8 → 0.23, 16×6 → 0.53, 32×6 → 0.75, 16×4 → 0.90.
  * - r4 webhook parse: plain-extraction SharedExpr 3.47s vs
  *   OncePerRowExpr barrier 4.31s over 600k payloads; nested-With
  *   limitation keeps the barrier in production.
  * - r4 dedup_clusters sf0.1 min-of-3 across sessions: 4.12/4.48/
  *   4.64s minima — r3's 6.53 was host variance, no regression.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dbg] $label%-44s $s%6.2fs"); s
    }

    // mirror Bench's warm-up exactly
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("publish_split_item", "publish_split_holding", "bib_brief",
        "marc_xml_roundtrip", "marc_binary_roundtrip", "marc_build",
        "delete_file_actions", "item_row", "dedup_minhash").foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").count()
    }
    graft.marc.MarcCorpus.splitRecords(graft.sources.Tables(spark, sf)).count()

    // which A-group key does Map order run FIRST in the bench loop?
    val aGroup = Set("marc_build", "marc_xml_roundtrip", "marc_binary_roundtrip",
      "publish_split_bib", "publish_split_holding", "publish_split_item",
      "bib_brief", "delete_file_actions", "deleted_record_history",
      "ids_projection", "item_row", "bib_part_links")
    println(s"[dbg] A-group bench order: " +
      SparkEntry.queries.keysIterator.filter(aGroup).mkString(" → "))

    // r6 sf1 experiment: where do the A-group's 160s go at 10× data?
    // raw fused parse (no persist) vs persist materialization vs the
    // post-persist consumers; then the storage footprint (spill?)
    val sf1 = "/tmp/graft_sf1"
    if (new java.io.File(sf1).isDirectory) {
      (1 to 2).foreach { i =>
        time(s"sf1 raw splitRecords count (no persist) run$i") {
          graft.marc.MarcCorpus.splitRecords(
            graft.sources.Tables(spark, sf1)).count(); ()
        }
      }
      SparkEntry.resetCaches(spark)
      time("sf1 publish_split_bib (pays persist)") {
        SparkEntry.queries("publish_split_bib")(spark, sf1).count(); ()
      }
      Seq("publish_split_holding", "publish_split_item", "marc_build",
          "marc_xml_roundtrip", "marc_binary_roundtrip", "ids_from_files")
        .foreach { q =>
          time(s"sf1 $q (warm cache)") {
            SparkEntry.queries(q)(spark, sf1).count(); ()
          }
        }
      spark.sparkContext.getRDDStorageInfo.foreach { info =>
        println(s"[dbg] cached ${info.name}: mem=${info.memSize / 1048576}MB " +
          s"disk=${info.diskSize / 1048576}MB parts=${info.numCachedPartitions}")
      }
    }
    spark.stop()
  }
}
