package graft.marc

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.marc.PublishSplit.PublishRow

/** Delete-file processing — process_delete_file
  * (alma_publish_parser.py:341-380): each record in a delete publish
  * file triggers at most one holding delete (the FIRST 852 carrying a
  * holding-id subfield; the reference `break`s after it) and one bib
  * delete (the 001). Emitted as (record_type, record_id) action rows —
  * apply with [[graft.sources.DataSyncStore.deleteKeys]] and append to
  * the `deleted_record` history table.
  */
object DeleteFiles {

  def deleteActions(records: Dataset[PublishRow]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.flatMap { r =>
      val holding = r.fields.iterator
        .filter(_.tag == "852")
        .flatMap(f => PublishSplit.holdingIdSubfield(f))
        .take(1).toSeq
      holding.map(s => ("holding", s.value)) :+ (("bib", r.mms_id))
    }.toDF("record_type", "record_id")
  }
}
