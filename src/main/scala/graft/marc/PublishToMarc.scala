package graft.marc

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.PublishFiles

/** The alma_publish_to_marc.py CLI as one distributed job: Alma publish
  * file(s) in → bib MARC + holding MARC (ISO-2709 streams) + item JSONL
  * out (alma_publish_to_marc.py:9-37).
  *
  * The reference forces max_workers=1 so concurrent writes don't
  * corrupt its three shared output files; here each output is a
  * DIRECTORY of part files (the Hadoop layout every downstream MARC
  * tool set can concatenate or read per-part), so the write is
  * parallel across the cluster — record order within a part follows
  * the source ordinal.
  */
object PublishToMarc {

  case class Outputs(bibs: Long, holdings: Long, items: Long)

  /** Write each partition's concatenated ISO-2709 records as one
    * `part-NNNNN.mrc` (Hadoop FS API — works on object stores).
    *
    * Overwrite semantics match `mode("overwrite")`: the target directory
    * is cleared first, so a re-run with fewer partitions can't leave
    * stale parts from a prior run mixed into the output. Each task
    * writes to an attempt-unique `.tmp` path and renames into place on
    * success, so a speculative or zombie attempt never interleaves
    * bytes with the winner's file.
    */
  private def writeMarcParts(records: Dataset[Array[Byte]], dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      records.sparkSession.sessionState.newHadoopConf())
    val base = new Path(dir)
    val fs0 = base.getFileSystem(conf.value)
    if (fs0.exists(base)) fs0.delete(base, true)
    fs0.mkdirs(base)
    records.foreachPartition { (it: Iterator[Array[Byte]]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val part = f"part-${tc.partitionId()}%05d.mrc"
        val tmp = new Path(s"$dir/.$part.attempt-${tc.taskAttemptId()}.tmp")
        val out = new Path(s"$dir/$part")
        val fs = out.getFileSystem(conf.value)
        val stream = fs.create(tmp, true)
        try it.foreach(stream.write) finally stream.close()
        // first attempt to finish wins; losers leave only a .tmp we ignore
        if (!fs.rename(tmp, out)) fs.delete(tmp, false)
        ()
      }
    }
    // clear any leftover attempt temp files from lost speculative tasks
    fs0.globStatus(new Path(s"$dir/.part-*.tmp")) match {
      case null => ()
      case stale => stale.foreach(s => fs0.delete(s.getPath, false))
    }
  }

  /** One publish run: read → split → first-wins dedup → three outputs.
    * Returns the written record counts (the reference's run log).
    */
  def run(spark: SparkSession, publishGlob: String,
          bibDir: String, holdingDir: String, itemDir: String): Outputs = {
    import spark.implicits._
    val records = PublishFiles.readPublishFilesOrdered(spark, publishGlob)
    val split = PublishSplit.splitOrdered(records).persist()
    try {
      val bibs = Relational.firstPerKey(split.filter(col("kind") === "bib"),
        Seq("mms_id"), Seq(col("ordinal"), xxhash64(col("leader"), col("fields"))))
      val holdings = Relational.firstPerKey(split.filter(col("kind") === "holding"),
        Seq("holding_id"), Seq(col("ordinal"), xxhash64(col("leader"), col("fields"))))
      val items = split.filter(col("kind") === "item")

      val bibMarc = bibs.select("mms_id", "leader", "fields").as[PublishSplit.PublishRow]
        .flatMap(r => Iso2709.encodeCapped(r.leader, r.fields, "BIB"))
      val holdingMarc = holdings
        .select(col("holding_id").as("mms_id"), col("leader"), col("fields"))
        .as[PublishSplit.PublishRow]
        .flatMap(r => Iso2709.encodeCapped(r.leader, r.fields, "HLD"))
      writeMarcParts(bibMarc, bibDir)
      writeMarcParts(holdingMarc, holdingDir)
      // item_json is already the serialized object → JSONL is a text write
      items.select(col("item_json")).write.mode("overwrite").text(itemDir)

      Outputs(bibs.count(), holdings.count(), items.count())
    } finally { split.unpersist(); () }
  }
}
