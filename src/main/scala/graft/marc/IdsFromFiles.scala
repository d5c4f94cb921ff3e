package graft.marc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-mode id dump — ids_from_files.py:26-53: every MARC-XML file's
  * records print their 001, and files with "delete" in the name are
  * skipped entirely (line 51-52).
  *
  * Spark shape: the file manifest is a DataFrame of (path, content);
  * the name filter is a pushable column predicate and the per-file XML
  * parse is a typed flatMap — one task per file batch, no driver loop.
  */
object IdsFromFiles {

  def ids(files: DataFrame, pathCol: String = "path",
          contentCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.filter(!col(pathCol).contains("delete"))
      .select(col(contentCol)).as[String]
      .flatMap(xml => MarcXml.parseRecords(xml).map(_.mms_id))
      .toDF("record_id")
  }
}
