package graft

import org.apache.spark.sql.functions._
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
    (1 to 2).foreach { round =>
      val corpus = graft.marc.MarcCorpus.publishRecords(t)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round corpus materialize")(corpus.count())
      val split = graft.marc.PublishSplit.split(corpus).toDF()
      time(s"r$round split count")(split.count())
      val p = split.persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round split persist")(p.count())
      time(s"r$round item from_json")(
        SparkEntry.queries("publish_split_item")(spark, "/root/testdata/sf0.1").count())
      p.unpersist(); corpus.unpersist()
    }
    spark.stop()
  }
}
