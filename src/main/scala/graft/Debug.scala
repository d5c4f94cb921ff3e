package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val split = graft.marc.PublishSplit.split(
      graft.marc.MarcCorpus.publishRecords(t)).toDF()
    split.groupBy("kind").count().show(false)
    split.filter(col("kind") === "error").select("error").distinct().show(5, 200)
    spark.stop()
  }
}
