package graft

import org.apache.spark.storage.StorageLevel

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // JIT warm-up on the small sf, as Bench does
    SparkEntry.queries("publish_split_item")(spark, "/root/testdata/sf0.001").count()
    (1 to 2).foreach { round =>
      val fused = graft.marc.MarcCorpus.splitRecords(t)
      println(s"[dbg] fused partitions = ${fused.rdd.getNumPartitions}")
      time(s"r$round fused split count")(fused.count())
      val p = fused.toDF().persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round fused split persist")(p.count())
      p.unpersist()
    }
    spark.stop()
  }
}
