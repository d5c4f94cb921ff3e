package graft

import org.apache.spark.storage.StorageLevel

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // JIT warm-up identical to Bench
    SparkEntry.queries("publish_split_item")(spark, "/root/testdata/sf0.01").count()
    (1 to 3).foreach { round =>
      time(s"r$round corpus inputs only")(
        graft.marc.MarcCorpus.corpusInputs(t).toDF().count())
      time(s"r$round inputs+assemble")(
        graft.marc.MarcCorpus.corpusInputs(t).map(graft.marc.MarcCorpus.assemble).count())
      val fused = graft.marc.MarcCorpus.splitRecords(t)
      time(s"r$round +splitRecord (no persist)")(fused.count())
      val p = fused.toDF().persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round +persist nested union")(p.count())
      p.unpersist()
      time(s"r$round full query first-touch")(
        SparkEntry.queries("publish_split_item")(spark, "/root/testdata/sf0.1").count())
      time(s"r$round cached re-read")(
        SparkEntry.queries("publish_split_item")(spark, "/root/testdata/sf0.1").count())
    }
    spark.stop()
  }
}
