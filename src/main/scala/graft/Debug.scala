package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val corpus = graft.marc.MarcCorpus.publishRecords(t)
    time("corpus hash(fields)")(
      corpus.select(min(xxhash64(col("fields")))).collect())
    time("corpus hash(fields) again")(
      corpus.select(min(xxhash64(col("fields")))).collect())
    import spark.implicits._
    val ds = corpus.select("mms_id", "leader", "fields")
      .as[graft.marc.PublishSplit.PublishRow]
    time("deser only (map id)")(ds.map(_.fields.size).reduce(_ + _))
    time("split logic + ser")(
      graft.marc.PublishSplit.split(corpus).toDF().count())
    spark.stop()
  }
}
