package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.marc.{Iso2709, MarcXml}
import graft.marc.PublishSplit.PublishRow

/** Publish-file sources: MARC-XML, tar.gz'd MARC-XML, and binary
  * ISO-2709 files → a Dataset of publish records.
  *
  * Re-expresses parse_file / process_publish_marc
  * (alma_publish_parser.py:197-238, 280-308): the reference fans files
  * out over a ThreadPoolExecutor on one box; here each FILE is one row
  * of a `binaryFile` scan and record parsing is a flatMap — parallel
  * across the cluster with no driver involvement, which is the shape
  * that survives 100 TB of publish files. Works identically under
  * `spark.readStream` (FileStreamSource + maxFilesPerTrigger) for the
  * staged-ingest path.
  */
object PublishFiles {

  /** (record, source file) rows decoded from one publish file's bytes. */
  def decodeFile(path: String, bytes: Array[Byte]): Seq[PublishRow] = {
    if (path.endsWith(".gz")) {
      val tar = new TarArchiveInputStream(
        new GZIPInputStream(new BufferedInputStream(
          new ByteArrayInputStream(bytes))))
      val out = Seq.newBuilder[PublishRow]
      var entry = tar.getNextEntry
      var last: Array[Byte] = null
      while (entry != null) {
        if (!entry.isDirectory) {
          val buf = new ByteArrayOutputStream()
          val tmp = new Array[Byte](64 * 1024)
          var n = tar.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = tar.read(tmp) }
          last = buf.toByteArray // reference keeps the LAST member (parser:210-213)
        }
        entry = tar.getNextEntry
      }
      if (last != null) out ++= MarcXml.parseRecords(new String(last, "UTF-8"))
      out.result()
    } else if (path.endsWith(".xml")) {
      MarcXml.parseRecords(new String(bytes, "UTF-8"))
    } else {
      Iso2709.decodeAll(bytes)
    }
  }

  /** Batch read of a directory/glob of publish files. */
  def readPublishFiles(spark: org.apache.spark.sql.SparkSession,
                       pathGlob: String): Dataset[PublishRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => decodeFile(p, b) }
  }

  /** Batch read carrying each record's position as an `ordinal` column
    * (`<path>#<zero-padded in-file index>`, lexically ordered =
    * sorted-file record order) — the deterministic dedup order for
    * [[graft.AlmaPipeline.ingestPublish]] (the reference processes
    * files sorted and keeps first occurrence,
    * alma_publish_parser.py:172-183).
    */
  def readPublishFilesOrdered(spark: org.apache.spark.sql.SparkSession,
                              pathGlob: String): DataFrame = {
    import spark.implicits._
    decodeOrdered(spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])])
  }

  /** (path, bytes) rows → (mms_id, leader, fields, ordinal) records —
    * the shared decode for the batch and streaming ordered readers.
    */
  def decodeOrdered(files: Dataset[(String, Array[Byte])]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.flatMap { case (p, b) =>
        decodeFile(p, b).zipWithIndex.map { case (r, ix) =>
          (f"$p#$ix%09d", r)
        }
      }
      .toDF("ordinal", "r")
      .select(col("r")("mms_id").as("mms_id"), col("r")("leader").as("leader"),
              col("r")("fields").as("fields"), col("ordinal"))
  }

  /** Streaming read: same decode, driven by the file-stream source
    * (one trigger per arriving stable file set).
    */
  def streamPublishFiles(spark: org.apache.spark.sql.SparkSession,
                         dir: String, maxFilesPerTrigger: Int = 8): Dataset[PublishRow] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, b) => decodeFile(p, b) }
  }

  /** Publish-file batch prefix — file_prefix (alma_publish_parser.py:
    * 310-312): strip `_[a-z]+_\d+.tar.gz` then `_[a-z]+.tar.gz`.
    */
  def filePrefix(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(path, "_[a-z]+_\\d+\\.tar\\.gz$", ""),
      "_[a-z]+.tar\\.gz$", "")

  /** Group files into consecutive same-prefix batches — group_files
    * (alma_publish_parser.py:314-328). Returns (path, file_prefix,
    * batch_ix) where batch_ix increments whenever the prefix changes in
    * sorted-path order (consecutive-run semantics, same machinery as
    * the analytics importer's run detection).
    *
    * Scale shape (gaps-and-islands, no global window): a manifest is
    * metadata-sized, but the same code serves corpus-sized run
    * detection, so: global path ordinal via the zipWithIndex pattern
    * ([[graft.operators.Relational.chunkIndex]] with n=1), island key =
    * ordinal − rank-within-prefix (a PARTITIONED window), island rank
    * by first ordinal — every stage distributed.
    */
  def groupFileBatches(files: DataFrame, pathCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = graft.operators.Relational.chunkIndex(
      files.withColumn("file_prefix", filePrefix(col(pathCol))),
      pathCol, 1, "__ord")
    val wp = Window.partitionBy("file_prefix").orderBy("__ord")
    val islands = ord.withColumn("__island",
      col("__ord") - row_number().over(wp))
    val batches = islands.groupBy("file_prefix", "__island")
      .agg(min(col("__ord")).as("__b0"))
    val ranked = graft.operators.Relational
      .chunkIndex(batches, "__b0", 1, "batch_ix")
      .select("file_prefix", "__island", "batch_ix")
    islands.join(ranked, Seq("file_prefix", "__island"))
      .drop("__ord", "__island")
  }
}
