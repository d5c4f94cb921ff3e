package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with decode / feature-extract / resize / frame-sample
  * stages shaped for a 100 TB pipeline.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a
  * STUB — a deterministic stand-in keyed on the payload bytes (clearly
  * marked; swap for a real codec UDF in production). Everything
  * AROUND the stub is real and tested: the asset schema, the
  * per-partition batched processing (one decoder init per partition,
  * not per row — the expensive part at scale), the row-count-preserving
  * stage contracts, and the partition sizing guard.
  */
object Multimodal {

  /** Typed metadata carried with every opaque payload. */
  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),  // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Build an asset table from the documents corpus: payload is the
    * utf-8 text bytes (an opaque stand-in), metadata derived
    * deterministically.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (pmod(col("doc_id"), lit(240)) + 1).cast("int").as("n_frames"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** STUB decode: deterministic 8-float "feature vector" from the
    * payload bytes (xxh-style rolling fold). Replace with the real
    * codec; the signature (bytes, meta) → fixed-width features is what
    * a real decoder plugs into.
    */
  def fakeDecode(payload: Array[Byte], seed: Long): Array[Float] = {
    var h = seed
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      h = h * 6364136223846793005L + payload(i) + 1442695040888963407L
      out(i % 8) += (h % 1000L).toFloat / 1000f
      i += 1
    }
    out
  }

  private val FeaturizedSchema = StructType(
    AssetSchema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("decoded_in_batch", IntegerType, nullable = false)))

  /** Decode + featurize via mapPartitions: one (stub) decoder
    * initialization per PARTITION (the pattern that matters when the
    * real codec costs seconds to init), with decode fed in BOUNDED
    * batches — never `rows.toArray`: a partition of real image/video
    * payloads does not fit on one executor's heap. Each row records its
    * batch size so tests (and ops dashboards) can verify both that
    * batching happened and that memory stayed bounded.
    */
  def featurize(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FeaturizedSchema)
    assets.select("asset_id", "kind", "payload", "meta").mapPartitions { rows =>
      // per-partition decoder "init" (the stub's init is just a seed)
      val decoderSeed = 42L
      rows.grouped(batchSize).flatMap { batch =>
        val n = batch.length // ≤ batchSize payloads in memory at once
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = fakeDecode(if (payload == null) Array.empty else payload,
                                 decoderSeed)
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("kind"),
              r.getAs[Row]("meta"), feats.toSeq, n)
        }
      }
    }(enc)
  }

  /** Resize plan for images: target box computed from metadata
    * column-side (cheap), payload untouched (the real resample happens
    * in the decode stage at scale — never ship pixels through a
    * shuffle).
    */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta")("width")
    val h = col("meta")("height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    assets.withColumn("target_width", floor(w * scale).cast("int"))
      .withColumn("target_height", floor(h * scale).cast("int"))
  }

  /** Frame sampling for videos: every `stride`-th frame index from the
    * metadata, exploded to (asset_id, frame_ix) — pure column plan.
    */
  def sampleFrames(assets: DataFrame, stride: Int): DataFrame =
    assets.filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), col("meta")("n_frames") - 1,
                         lit(stride))).as("frame_ix"))
}
