package graft

import org.apache.spark.storage.StorageLevel

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Current experiment (VERDICT r2 #7): do marc_build +
  * delete_file_actions go faster with a shared persist of the
  * publish corpus (mms_id, leader, fields) than with the present
  * recompute-each design?
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"
    val t = graft.sources.Tables(spark, sf)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // JIT warm-up identical to Bench
    SparkEntry.queries("marc_build")(spark, "/root/testdata/sf0.01").count()
    SparkEntry.queries("delete_file_actions")(spark, "/root/testdata/sf0.01").count()

    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.marc.PublishSplit.PublishRow

    def fOrders = t.orders.filter(col("o_orderstatus") === "F")
      .select(graft.marc.MarcCorpus.mmsId(col("o_orderkey")).as("mms_id"))

    (1 to 3).foreach { round =>
      // A: recompute for each consumer (current design)
      val corpusA1 = graft.marc.MarcCorpus.publishRecords(t)
      time(s"r$round A marc_build (recompute)")(
        corpusA1.select(col("mms_id"), col("leader"),
          size(col("fields")).as("n_fields")).count())
      val corpusA2 = graft.marc.MarcCorpus.publishRecords(t)
      time(s"r$round A delete_file_actions (recompute)")(
        graft.marc.DeleteFiles.deleteActions(
          corpusA2.join(fOrders, "mms_id")
            .select("mms_id", "leader", "fields").as[PublishRow]).count())

      // B: one shared persist of the nested corpus
      val p = graft.marc.MarcCorpus.publishRecords(t)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time(s"r$round B materialize persist")(p.count())
      time(s"r$round B marc_build (cached)")(
        p.select(col("mms_id"), col("leader"),
          size(col("fields")).as("n_fields")).count())
      time(s"r$round B delete_file_actions (cached)")(
        graft.marc.DeleteFiles.deleteActions(
          p.join(fOrders, "mms_id")
            .select("mms_id", "leader", "fields").as[PublishRow]).count())
      p.unpersist(true)

      // C: serialized-storage persist variant (smaller footprint,
      // kryo/ser decode on read)
      val ps = graft.marc.MarcCorpus.publishRecords(t)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      time(s"r$round C materialize persist_ser")(ps.count())
      time(s"r$round C marc_build (cached_ser)")(
        ps.select(col("mms_id"), col("leader"),
          size(col("fields")).as("n_fields")).count())
      time(s"r$round C delete_file_actions (cached_ser)")(
        graft.marc.DeleteFiles.deleteActions(
          ps.join(fOrders, "mms_id")
            .select("mms_id", "leader", "fields").as[PublishRow]).count())
      ps.unpersist(true)
    }
    spark.stop()
  }
}
