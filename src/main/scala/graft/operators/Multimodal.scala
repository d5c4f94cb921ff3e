package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with decode / feature-extract / resize / frame-sample
  * stages shaped for a 100 TB pipeline.
  *
  * Decode is REAL for JDK-supported image formats (PNG / BMP / GIF /
  * JPEG via `javax.imageio` — pure JDK, headless-safe; see
  * [[decodeImageFeatures]] and [[resizeImagePng]]). Payloads the JDK
  * cannot decode (audio, video, and the test corpus's text-byte
  * stand-ins) fall back to `fakeDecode`, a deterministic STUB keyed on
  * the payload bytes (clearly marked; swap for a real codec UDF in
  * production). Everything AROUND decode is real and tested either
  * way: the asset schema, the per-partition batched processing (one
  * decoder init per partition, not per row — the expensive part at
  * scale), the row-count-preserving stage contracts, and the partition
  * sizing guard.
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

  /** True when the payload carries a JDK-decodable image format
    * (PNG / BMP / GIF / JPEG magic bytes) — these route through the
    * REAL [[decodeImageFeatures]] path; anything else falls back to
    * the deterministic stub below.
    */
  def isImagePayload(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte))

  /** REAL image decode for JDK-supported formats via `javax.imageio`
    * (pure JDK, headless-safe — no external codec libraries): 8
    * features `[width, height, meanR, meanG, meanB, meanLuma,
    * stdLuma, aspect]`. Same fixed-width contract as the stub, so the
    * two paths interchange per row. Throws on undecodable bytes — the
    * caller's per-row recovery turns that into a decode_error ROW.
    *
    * Reproducibility caveat: PNG / BMP / GIF decode losslessly, so
    * their features are stable across JDKs and platforms. JPEG decode
    * is NOT bit-specified — IDCT rounding may differ between JDK
    * versions — so JPEG-derived features carry no cross-environment
    * bit-reproducibility guarantee and must stay off any
    * oracle-verified surface (the specs pin only lossless formats).
    */
  def decodeImageFeatures(payload: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new java.io.IOException("undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h.toLong).toDouble
    val ml = sl / n
    Array(w.toFloat, h.toFloat,
      (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat, ml.toFloat,
      math.sqrt(math.max(0.0, sl2 / n - ml * ml)).toFloat,
      (w.toDouble / h.toDouble).toFloat)
  }

  /** REAL image resize (pure JDK `Graphics2D`, headless-safe): decode,
    * bilinear-resample into `(targetW, targetH)`, re-encode as PNG
    * bytes — the executable counterpart of [[resizePlan]]'s
    * metadata-side box computation. Throws on undecodable bytes.
    */
  def resizeImagePng(payload: Array[Byte], targetW: Int,
                     targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, "target box must be positive")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new java.io.IOException("undecodable image payload")
    val out = new java.awt.image.BufferedImage(
      targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** RIFF/WAVE magic sniff — routes to [[decodeWavFeatures]]. */
  def isWavPayload(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL audio decode for WAV via `javax.sound.sampled` (pure JDK,
    * headless-safe — no codec libraries): 8 features `[sampleRateHz,
    * channels, bitsPerSample, nFrames, durationMilli, rmsMilli,
    * peak, zeroCrossPermille]` over the FIRST channel's 16-bit PCM
    * samples. All sample statistics are computed in exact integer
    * arithmetic (sum of squares in Long, permille by integer div) —
    * PCM is lossless, so unlike JPEG these features ARE
    * bit-reproducible across JDKs/platforms. Non-PCM / non-16-bit
    * encodings throw (→ the caller's decode-error ROW), same contract
    * as undecodable images.
    */
  def decodeWavFeatures(payload: Array[Byte]): Array[Float] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16)
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          s"only 16-bit signed PCM supported, got $fmt")
      val bytes = in.readAllBytes()
      val frameSize = fmt.getFrameSize // channels * 2 bytes
      val channels = fmt.getChannels
      val nFrames = bytes.length / frameSize
      val big = fmt.isBigEndian
      var i = 0; var sumSq = 0L; var peak = 0L; var crossings = 0L
      var prevNonNeg = true
      while (i < nFrames) {
        val off = i * frameSize // first channel sample
        val s =
          if (big) ((bytes(off) << 8) | (bytes(off + 1) & 0xFF)).toShort
          else ((bytes(off + 1) << 8) | (bytes(off) & 0xFF)).toShort
        val v = s.toLong
        sumSq += v * v
        if (math.abs(v) > peak) peak = math.abs(v)
        val nonNeg = v >= 0L
        if (i > 0 && nonNeg != prevNonNeg) crossings += 1
        prevNonNeg = nonNeg
        i += 1
      }
      val rate = fmt.getSampleRate
      // duration in integer millis, rms in integer milli-units
      // (floor(1000·sqrt(Σv²/n)) over the exact integer Σv²),
      // zero crossings in integer permille of transitions
      val durationMilli =
        if (rate <= 0f) 0L else (nFrames.toLong * 1000L / rate.toLong)
      val rmsMilli =
        if (nFrames == 0) 0L
        else (math.sqrt(sumSq.toDouble / nFrames) * 1000.0).toLong
      Array(rate, channels.toFloat, fmt.getSampleSizeInBits.toFloat,
        nFrames.toFloat, durationMilli.toFloat, rmsMilli.toFloat,
        peak.toFloat,
        (if (nFrames > 1) crossings * 1000L / (nFrames - 1) else 0L).toFloat)
    } finally in.close()
  }

  /** STUB decode: deterministic 8-float "feature vector" from the
    * payload bytes (xxh-style rolling fold) — the fallback for
    * payloads the JDK cannot decode (the test corpus's text bytes,
    * video). Swap for a real codec UDF in production; the
    * signature (bytes, meta) → fixed-width features is what a real
    * decoder plugs into.
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
      StructField("features", ArrayType(FloatType, containsNull = true)),
      StructField("decoded_in_batch", IntegerType, nullable = false),
      StructField("decode_error", StringType, nullable = true)))

  /** Per-kind decode batch sizing: video/audio payloads are orders of
    * magnitude larger than images, so their batches are smaller for the
    * same memory bound.
    */
  def batchSizeFor(kind: String, base: Int): Int = kind match {
    case "video" => math.max(1, base / 8)
    case "audio" => math.max(1, base / 4)
    case _       => base
  }

  /** Decode + featurize via mapPartitions: one (stub) decoder
    * initialization per PARTITION (the pattern that matters when the
    * real codec costs seconds to init), with decode fed in BOUNDED
    * per-kind batches — never `rows.toArray`: a partition of real
    * image/video payloads does not fit on one executor's heap. Each row
    * records its batch size so tests (and ops dashboards) can verify
    * both that batching happened and that memory stayed bounded.
    *
    * A failing decode produces an error ROW (null features +
    * decode_error message), never a failed task — one poison asset in a
    * 100 TB scan must not kill the partition (same contract as the
    * ISO-2709 reader's per-record recovery).
    */
  def featurize(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FeaturizedSchema)
    assets.select("asset_id", "kind", "payload", "meta").mapPartitions { rows =>
      // per-partition decoder "init" (the stub's init is just a seed)
      val decoderSeed = 42L
      // outer grouped() bounds memory even when kinds interleave; the
      // per-kind regroup inside shrinks video/audio batches further
      rows.grouped(batchSize).flatMap { batch =>
        batch.groupBy(_.getAs[String]("kind")).iterator.flatMap { case (kind, ofKind) =>
          ofKind.grouped(batchSizeFor(kind, batchSize)).flatMap { kindBatch =>
            val n = kindBatch.length // ≤ per-kind cap payloads at once
            kindBatch.iterator.map { r =>
              val payload = r.getAs[Array[Byte]]("payload")
              try {
                // JDK-decodable bytes take the REAL paths (ImageIO
                // images, javax.sound WAV/PCM audio); everything else
                // the deterministic stub
                val feats =
                  if (kind == "image" && isImagePayload(payload))
                    decodeImageFeatures(payload)
                  else if (kind == "audio" && isWavPayload(payload))
                    decodeWavFeatures(payload)
                  else if (kind == "video" && isGvidPayload(payload))
                    // a video asset featurizes as its FIRST frame
                    // (stated) — real container split + real PNG
                    // decode; an empty container throws into the
                    // error-row path like any other bad payload
                    decodeImageFeatures(gvidFrames(payload).head)
                  else fakeDecode(
                    if (payload == null) Array.empty else payload, decoderSeed)
                Row(r.getAs[Long]("asset_id"), r.getAs[String]("kind"),
                    r.getAs[Row]("meta"), feats.toSeq, n, null)
              } catch {
                case scala.util.control.NonFatal(e) =>
                  Row(r.getAs[Long]("asset_id"), r.getAs[String]("kind"),
                      r.getAs[Row]("meta"), null, n, String.valueOf(e.getMessage))
              }
            }
          }
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

  /** Frame-sample → featurize chaining: sampled frame indices become
    * frame "assets" (payload sliced deterministically per frame in the
    * stub; a real decoder would seek), featurized with the same bounded
    * per-kind batching. Output: one feature row per (asset, frame).
    */
  def featurizeSampledFrames(assets: DataFrame, stride: Int,
                             batchSize: Int = 64): DataFrame = {
    val frames = sampleFrames(assets, stride)
      .join(assets.select(col("asset_id"), col("payload"), col("meta")), "asset_id")
      .select(
        // frame pseudo-asset id: asset_id * 2^16 + frame_ix (ids are
        // doc-sized, frame counts < 240 — no collision)
        (col("asset_id") * 65536 + col("frame_ix")).as("asset_id"),
        lit("image").as("kind"), // a decoded frame featurizes as an image
        // the stub "seeks" by slicing the payload per frame — distinct
        // frames produce distinct features deterministically
        substring(col("payload"), (pmod(col("frame_ix"), lit(16)) + 1).cast("int"),
                  lit(1 << 20)).as("payload"),
        col("meta"))
    featurize(frames, batchSize)
      .select(expr("asset_id div 65536").as("asset_id"),
              pmod(col("asset_id"), lit(65536)).cast("int").as("frame_ix"),
              col("features"), col("decode_error"))
  }

  /** dHash perceptual image hash (E90 — the near-duplicate signal for
    * the IMAGE modality, the pixel-space sibling of the text family's
    * simhash: re-encoded, recompressed, or lightly-edited copies of
    * the same picture land within a few bits): decode, average-pool
    * the integer milli-luma (299r+587g+114b) onto a 9×8 grid with
    * integer block bounds (`x0 = gx·w div 9` — OWN pooling, not
    * Graphics2D resampling, whose bilinear kernel is not
    * bit-specified; integer average pooling over exact pixel sums is
    * platform-exact for lossless formats, the repo's multimodal
    * reproducibility contract), then 64 bits of horizontal gradient
    * signs `cell(gx) < cell(gx+1)` packed row-major. Requires
    * `w ≥ 9 && h ≥ 8` (smaller images have no 9×8 grid — throws, and
    * [[imageNearDup]] turns that into an error row).
    */
  def imageDHash(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new java.io.IOException("undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    if (w < 9 || h < 8)
      throw new java.io.IOException(s"image too small for dHash: ${w}x$h")
    val cells = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var sum = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xFF) +
              587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
            cnt += 1; x += 1
          }
          y += 1
        }
        cells(gy)(gx) = sum / cnt
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var bit = 0
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cells(gy)(gx) < cells(gy)(gx + 1)) hash |= (1L << bit)
        bit += 1; gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Deterministic 9×8 grayscale PNG whose [[imageDHash]] equals
    * `pattern` EXACTLY — the planted-corpus device that makes E90
    * driver-verifiable (the mutual_knn_ann precedent: the oracle
    * re-derives the planted pair set as literals): per row `gy` the
    * cell value starts at `lumaBase` and steps +1 exactly where bit
    * `gy·8+gx` of `pattern` is set, so `cell(gx) < cell(gx+1)` iff
    * the bit is set (equal otherwise — NOT less) and the packed
    * gradient signs reproduce `pattern` bit-for-bit. One pixel per
    * grid cell (`w=9, h=8`, integer pooling is the identity), gray
    * pixels make the milli-luma exact (`1000·v`), and PNG is lossless
    * — so the hash survives any encoder byte layout. Two images with
    * the same pattern but different `lumaBase` are distinct payloads
    * with IDENTICAL dHash (hamming 0); flipping k bits of the pattern
    * yields hamming exactly k.
    */
  def syntheticDHashImage(pattern: Long, lumaBase: Int): Array[Byte] = {
    require(lumaBase >= 0 && lumaBase <= 246,
      s"lumaBase must leave headroom for +8 steps, got $lumaBase")
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var gy = 0
    while (gy < 8) {
      var v = lumaBase
      img.setRGB(0, gy, (v << 16) | (v << 8) | v)
      var gx = 0
      while (gx < 8) {
        if (((pattern >>> (gy * 8 + gx)) & 1L) == 1L) v += 1
        img.setRGB(gx + 1, gy, (v << 16) | (v << 8) | v)
        gx += 1
      }
      gy += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** splitmix64 finalizer — the per-id 64-bit pattern source for the
    * planted image corpus (bijective, so distinct ids never collide
    * on the full pattern; 3-bit-ball collisions between INDEPENDENT
    * patterns are ~2⁻⁴⁵ per pair, absent at every test SF).
    */
  def scramble64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val DHashSchema = StructType(Seq(
    StructField("asset_id", LongType), StructField("dhash", LongType),
    StructField("decode_error", StringType)))

  /** Near-duplicate image pairs via dHash banding: hash every image
    * payload ([[imageDHash]]; failures become error ROWS, the
    * [[featurize]] contract), then pair candidates through 4 exact
    * 16-bit band buckets — pigeonhole: any pair within `maxHamming ≤ 3`
    * bits shares at least one intact band, so the only shuffle is the
    * band-keyed groupBy (the simhash blocking device; NO all-pairs) —
    * and verify with the exact `popcount(xor) ≤ maxHamming`.
    * Returns (pairs, errors).
    */
  def imageNearDup(assets: DataFrame, maxHamming: Int):
      (DataFrame, DataFrame) = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0,3] (4-band pigeonhole), got $maxHamming")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(DHashSchema)
    val hashed = assets.select("asset_id", "payload").mapPartitions {
      rows =>
        rows.map { r =>
          try Row(r.getAs[Long]("asset_id"),
            imageDHash(r.getAs[Array[Byte]]("payload")), null)
          catch {
            case scala.util.control.NonFatal(e) =>
              Row(r.getAs[Long]("asset_id"), null,
                String.valueOf(e.getMessage))
          }
        }
    }(enc)
    val ok = hashed.filter(col("dhash").isNotNull)
      .select(col("asset_id"), col("dhash"))
    val errors = hashed.filter(col("dhash").isNull)
      .select(col("asset_id"), col("decode_error"))
    val pairs = hammingBandPairs(
      ok.select(col("asset_id"), col("dhash").as("__h")), maxHamming)
    (pairs, errors)
  }

  /** Shared 4×16-bit pigeonhole banding + exact popcount verify over a
    * 64-bit perceptual hash column `__h` — the blocking device both
    * [[imageNearDup]] and [[audioNearDup]] ride: any pair within
    * `maxHamming ≤ 3` bits shares at least one intact 16-bit band, so
    * the only shuffle is the band-keyed self-join (NO all-pairs).
    */
  private def hammingBandPairs(ok: DataFrame,
                               maxHamming: Int): DataFrame = {
    val banded = ok.select(col("asset_id"), col("__h"),
      explode(expr("""transform(sequence(0, 3), b -> struct(b AS band,
        shiftright(__h, CAST(b * 16 AS INT)) & 65535 AS sig))"""))
        .as("__b"))
      .select(col("asset_id"), col("__h"),
        col("__b.band").as("band"), col("__b.sig").as("sig"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        expr("bit_count(a.__h ^ b.__h)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming.toLong)
  }

  /** 64-bit temporal-gradient AUDIO fingerprint — the [[imageDHash]]
    * analog for the audio modality (re-encoded, re-gained, or
    * lightly-edited copies of the same clip land within a few bits):
    * decode 16-bit PCM ([[decodeWavFeatures]]' contract — PCM is
    * lossless, so the fingerprint is bit-reproducible across
    * JDKs/platforms), average-pool the first channel's |sample| onto
    * 65 time segments with integer block bounds (`s0 = i·n div 65` —
    * exact integer pooling, the multimodal reproducibility contract),
    * then pack 64 energy-gradient signs `seg(i) < seg(i+1)`. Requires
    * ≥ 65 frames (shorter clips have no 65-segment grid — throws, and
    * [[audioNearDup]] turns that into an error row).
    */
  def audioFingerprint(payload: Array[Byte]): Long = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16)
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          s"only 16-bit signed PCM supported, got $fmt")
      val bytes = in.readAllBytes()
      val frameSize = fmt.getFrameSize
      val n = bytes.length / frameSize
      if (n < 65)
        throw new java.io.IOException(
          s"audio too short for fingerprint: $n frames")
      val big = fmt.isBigEndian
      val seg = new Array[Long](65)
      var i = 0
      while (i < 65) {
        val s0 = i.toLong * n / 65; val s1 = (i + 1).toLong * n / 65
        var sum = 0L
        var j = s0
        while (j < s1) {
          val off = (j * frameSize).toInt // first channel sample
          val s =
            if (big) ((bytes(off) << 8) | (bytes(off + 1) & 0xFF)).toShort
            else ((bytes(off + 1) << 8) | (bytes(off) & 0xFF)).toShort
          sum += math.abs(s.toLong)
          j += 1
        }
        seg(i) = sum / (s1 - s0)
        i += 1
      }
      var fp = 0L
      i = 0
      while (i < 64) {
        if (seg(i) < seg(i + 1)) fp |= (1L << i)
        i += 1
      }
      fp
    } finally in.close()
  }

  /** Deterministic WAV clip whose [[audioFingerprint]] equals
    * `pattern` EXACTLY — the planted-corpus device that makes the
    * audio near-dup rung driver-verifiable (the
    * [[syntheticDHashImage]] precedent, rotated from pixel space to
    * time): 65 segments of 64 constant-amplitude samples each, the
    * amplitude starting at `ampBase` and stepping +1 exactly where
    * bit `i` of `pattern` is set, so `seg(i) < seg(i+1)` iff the bit
    * is set (equal otherwise — NOT less) and the packed gradient
    * signs reproduce `pattern` bit-for-bit. Segment mean-|PCM| is
    * exact (integer pooling over 64-sample blocks is exact division),
    * and WAV/PCM is lossless — so the fingerprint survives the
    * encoder. Two clips with the same pattern but different `ampBase`
    * are distinct payloads with IDENTICAL fingerprint (hamming 0);
    * flipping k pattern bits yields hamming exactly k.
    */
  def syntheticFingerprintWav(pattern: Long, ampBase: Int): Array[Byte] = {
    require(ampBase >= 0 && ampBase <= 32000,
      s"ampBase must leave headroom for +64 steps, got $ampBase")
    val samples = new Array[Short](65 * 64)
    var amp = ampBase
    var i = 0
    while (i < 65) {
      var j = 0
      while (j < 64) { samples(i * 64 + j) = amp.toShort; j += 1 }
      if (i < 64 && ((pattern >>> i) & 1L) == 1L) amp += 1
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private val AfpSchema = StructType(Seq(
    StructField("asset_id", LongType), StructField("afp", LongType),
    StructField("decode_error", StringType)))

  /** Near-duplicate AUDIO pairs — [[imageNearDup]]'s rung for the
    * audio modality: fingerprint every payload ([[audioFingerprint]];
    * failures become error ROWS), then the shared 4-band pigeonhole
    * + exact popcount ([[hammingBandPairs]]). Returns (pairs, errors).
    */
  def audioNearDup(assets: DataFrame, maxHamming: Int):
      (DataFrame, DataFrame) = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0,3] (4-band pigeonhole), got $maxHamming")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(AfpSchema)
    val hashed = assets.select("asset_id", "payload").mapPartitions {
      rows =>
        rows.map { r =>
          try Row(r.getAs[Long]("asset_id"),
            audioFingerprint(r.getAs[Array[Byte]]("payload")), null)
          catch {
            case scala.util.control.NonFatal(e) =>
              Row(r.getAs[Long]("asset_id"), null,
                String.valueOf(e.getMessage))
          }
        }
    }(enc)
    val ok = hashed.filter(col("afp").isNotNull)
      .select(col("asset_id"), col("afp").as("__h"))
    val errors = hashed.filter(col("afp").isNull)
      .select(col("asset_id"), col("decode_error"))
    (hammingBandPairs(ok, maxHamming), errors)
  }

  // ---- video: the GVID frame container (E107) ----------------------------

  /** Minimal length-prefixed frame container for the VIDEO modality
    * (the third rung of the real-decode ladder after PNG/ImageIO and
    * WAV/javax.sound — the JDK ships no video codec, so the container
    * is ours, but every FRAME inside is a real PNG through the real
    * decoder; a production deployment swaps [[gvidFrames]] for an
    * ffmpeg-backed splitter and NOTHING downstream changes): magic
    * "GVID", u16 big-endian frame count, then per frame u32 length +
    * PNG bytes.
    */
  def isGvidPayload(p: Array[Byte]): Boolean =
    p != null && p.length >= 6 && p(0) == 'G' && p(1) == 'V' &&
      p(2) == 'I' && p(3) == 'D'

  /** Planted video: one [[syntheticDHashImage]] PNG frame per pattern
    * — each frame's dHash IS its pattern bit-for-bit, so a frame-level
    * assertion needs no decode-side oracle.
    */
  def syntheticGvid(patterns: Seq[Long], lumaBase: Int): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    out.write(Array[Byte]('G', 'V', 'I', 'D'))
    out.writeShort(patterns.length)
    patterns.foreach { p =>
      val png = syntheticDHashImage(p, lumaBase)
      out.writeInt(png.length)
      out.write(png)
    }
    out.flush()
    baos.toByteArray
  }

  /** Split a GVID container into frame payloads; throws on a corrupt
    * container (bad magic, truncated frame) — callers route that to
    * error rows (the [[featurize]] contract).
    */
  def gvidFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    if (!isGvidPayload(payload))
      throw new IllegalArgumentException("not a GVID container")
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(payload, 4, payload.length - 4))
    val n = in.readUnsignedShort()
    (0 until n).map { _ =>
      val len = in.readInt()
      if (len < 0 || len > payload.length)
        throw new IllegalArgumentException(s"corrupt frame length $len")
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
  }

  private val VFrameSchema = StructType(Seq(
    StructField("asset_id", LongType), StructField("frame_ix", LongType),
    StructField("n_frames", LongType), StructField("dhash", LongType),
    StructField("decode_error", StringType)))

  /** Strided video frame hashing (E107 — the REAL upgrade of the
    * [[featurizeSampledFrames]] stub's seek-by-slice: container split
    * + per-frame PNG decode + [[imageDHash]], all real; the per-video
    * fan-out is bounded by the stride and frames never leave the
    * partition that decoded them): every `stride`-th frame of each
    * container becomes `(asset_id, frame_ix, n_frames, dhash)`;
    * corrupt containers or undecodable frames become error ROWS (one
    * per asset, first failure wins — a corrupt tail never kills the
    * task). Returns (frames, errors).
    *
    * Scale shape: one mapPartitions over the asset corpus —
    * decode-CPU-bound and embarrassingly parallel (the audio/image
    * probe result); downstream joins see frame-sized rows (≤
    * n_frames/stride per asset), never payload bytes.
    */
  def videoFrameHashes(assets: DataFrame, stride: Int):
      (DataFrame, DataFrame) = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(VFrameSchema)
    val rows = assets.select("asset_id", "payload").mapPartitions {
      it =>
        it.flatMap { r =>
          val id = r.getAs[Long]("asset_id")
          try {
            val frames = gvidFrames(r.getAs[Array[Byte]]("payload"))
            val nf = frames.length.toLong
            (0 until frames.length by stride).map { f =>
              Row(id, f.toLong, nf, imageDHash(frames(f)), null)
            }
          } catch {
            case scala.util.control.NonFatal(e) =>
              Seq(Row(id, null, null, null, String.valueOf(e.getMessage)))
          }
        }
    }(enc)
    val ok = rows.filter(col("dhash").isNotNull)
      .select(col("asset_id"), col("frame_ix"), col("n_frames"),
        col("dhash"))
    val errors = rows.filter(col("dhash").isNull)
      .select(col("asset_id"), col("decode_error"))
    (ok, errors)
  }

  private val VFeatSchema = StructType(Seq(
    StructField("asset_id", LongType), StructField("frame_ix", LongType),
    StructField("features", ArrayType(FloatType)),
    StructField("decode_error", StringType)))

  /** Strided REAL frame featurization for GVID videos — the mandate's
    * frame-sample → feature-extract chain with no stub in the path
    * (the [[featurizeSampledFrames]] seek-by-slice device remains for
    * foreign containers): container split + per-frame PNG decode →
    * the 8 [[decodeImageFeatures]] features per sampled frame;
    * corrupt containers or frames become error rows. Same
    * decode-bound mapPartitions shape as [[videoFrameHashes]].
    */
  def featurizeGvidFrames(assets: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(VFeatSchema)
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getAs[Long]("asset_id")
        try {
          val frames = gvidFrames(r.getAs[Array[Byte]]("payload"))
          (0 until frames.length by stride).map { f =>
            Row(id, f.toLong, decodeImageFeatures(frames(f)).toSeq, null)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            Seq(Row(id, null, null, String.valueOf(e.getMessage)))
        }
      }
    }(enc)
  }

  /** Near-duplicate VIDEO pairs by frame-set containment (E108 — the
    * video rung of the near-dup ladder, composed from
    * [[videoFrameHashes]] exactly as text containment composes from
    * shingles: a re-encoded / re-lit / trimmed copy shares most frame
    * hashes with its source even when no single "video hash" would
    * match): frame-level candidates ride the shared 4-band pigeonhole
    * on the frame dHash (frame key = asset·2¹⁶ + frame_ix, the
    * [[featurizeSampledFrames]] packing — frame counts are u16 by the
    * container format), same-video pairs drop, and per video pair the
    * DISTINCT matched frames of side a over a's sampled frame count
    * give `containment_permille` (side-a containment, stated — "how
    * much of a is inside b"); pairs at or above
    * `minSharedPermille` survive.
    *
    * Scale shape: band-keyed frame self-join (never all-pairs), one
    * pair agg, one video-sized count join — frame-sized throughout.
    */
  def videoNearDup(frames: DataFrame, maxHamming: Int,
                   minSharedPermille: Long): DataFrame = {
    require(minSharedPermille >= 0 && minSharedPermille <= 1000,
      s"minSharedPermille in [0,1000], got $minSharedPermille")
    val f = frames.select(
      (col("asset_id") * 65536L + col("frame_ix")).as("asset_id"),
      col("dhash").as("__h"))
    val fp = hammingBandPairs(f, maxHamming)
      .select(expr("id_a div 65536").as("id_a"),
        expr("id_a % 65536").as("__fa"),
        expr("id_b div 65536").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val nsa = frames.groupBy(col("asset_id").as("id_a"))
      .agg(count(lit(1)).as("n_sampled_a"))
    fp.groupBy("id_a", "id_b")
      .agg(countDistinct(col("__fa")).as("matched_frames"))
      .join(nsa, "id_a")
      .withColumn("containment_permille",
        expr("(1000 * matched_frames) div n_sampled_a"))
      .filter(col("containment_permille") >= minSharedPermille)
  }

  /** Per-video temporal drift report over the sampled frames: each
    * sampled frame's hamming distance to the video's FIRST sampled
    * frame — the cut/scene-change signal a frame-dedup pass gates on
    * (a video whose frames all hash alike is a still; a spike is a
    * cut). Relational tail on the frame-sized output of
    * [[videoFrameHashes]]: one asset-keyed equi-join (frame-sized
    * both sides — never payload bytes) + map-side popcount.
    */
  def videoFrameDrift(frames: DataFrame): DataFrame = {
    val f0 = frames.filter(col("frame_ix") === 0L)
      .select(col("asset_id"), col("dhash").as("__d0"))
    frames.join(f0, "asset_id")
      .select(col("asset_id"), col("frame_ix"), col("n_frames"),
        expr("CAST(bit_count(dhash ^ __d0) AS BIGINT)")
          .as("ham_to_first"))
  }
}
