package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data builder: replicate an existing testdata SF
  * directory `copies`× with disjoint key spaces, producing a larger
  * PERF dataset (the driver's generator tops out at sf0.1 locally).
  *
  * Each copy offsets every entity key by `copy * KeyOffset`, keeping
  * referential integrity (orders ↔ lineitem ↔ part/supplier,
  * customer ↔ orders) intact within and across copies. Content
  * columns are perturbed per copy so content-addressed operators see
  * fresh work instead of 10 exact clones:
  *   - `documents.text` gains a per-copy suffix token (exact/minhash
  *     dedup, fingerprints, BM25 vocab all see distinct docs);
  *   - `embeddings.embedding[0]` shifts by `copy * 1e-4` (ANN finds
  *     near- but not identical neighbors across copies);
  *   - `events.ts` / `orders.o_orderdate` shift by `copy` seconds
  *     (no cross-copy timestamp ties in sessionization/windows).
  * Shared dims (`region`, `nation`) stay single-copy — FK targets of
  * unchanged `*_nationkey` columns.
  *
  * This is a PERFORMANCE dataset: distributions are N shifted clones
  * of the sf0.1 generator output, good for measuring shuffle/memory/
  * plan behavior at N× volume, NOT for oracle comparison (the driver
  * only oracles driver-generated SFs).
  *
  * `docCopies` (4th arg, default = copies) separately controls the
  * documents/embeddings replication: clone replication makes TRUE
  * near-dup pair density quadratic in the copy count (every doc
  * gains copies−1 siblings), so a 100× relational rehearsal with
  * docCopies=100 measures a corpus whose duplication families are
  * 10× denser than the 10× rehearsal's — not 10× more data at equal
  * density (the r7 sf10 finding). docCopies=10 with copies=100 gives
  * the realistic split: 100× relational volume, sf1-density text.
  *
  * `docMode` (5th arg) controls HOW document copies differ:
  *   - `clone` (default): one suffix token per copy — copies stay
  *     NEAR-DUPS of each other, so family size ≈ docCopies (the
  *     density axis of the r8 density-vs-volume attribution);
  *   - `unique`: a copy-specific marker token is spliced in every 3
  *     source tokens, breaking cross-copy shingle overlap — copies
  *     are DISTINCT documents, so near-dup family density stays the
  *     BASE corpus's planted density while volume scales docCopies×.
  *     This is the realistic 1000× text corpus: at true production
  *     scale duplication families do not grow with corpus size, the
  *     corpus does. `n_chars` is recomputed from the rewritten text.
  *     Since r11, `unique` ALSO de-clones the two relational axes the
  *     r10 sf100 rehearsal adjudicated (the pair-density-bound set):
  *     - customer copies (r > 0) get a REBUILT `c_name` whose digit
  *       string is the shifted key plus a 3-digit copy suffix, so
  *       name-derived blocking keys (canonical name, last-4 digits)
  *       spread copies across DISTINCT blocks — entity density stays
  *       the base corpus's planted density (the per-copy dirty
  *       variants derive at read time) while volume scales copies×;
  *     - embedding copies (r > 0) get copy-keyed Rademacher signs
  *       (`hash(i, r)`-parity flips per coordinate — norm-preserving,
  *       deterministic), so cross-copy cosine drops to ~N(0, 1/√dim)
  *       and LSH/semantic near-dup families stay the planted density
  *       (within-copy planted pairs derive at read time from the
  *       copy's own vectors and keep cosine ≈ 1).
  *
  * Copies are written in CHUNKS of [[ChunkCopies]] (overwrite, then
  * append) so a 1000× build is twenty 50-way union jobs instead of
  * one 1000-way union plan — bounded plan size and bounded job
  * memory at any copy count.
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [outDir] [copies]
  * [docCopies] [docMode] [onlyTables]` — defaults:
  * /root/testdata/sf0.1 → /tmp/graft_sf1, 10 copies, docMode=clone,
  * all tables (`onlyTables` is a comma list for in-place
  * single-table rebuilds; `region` also covers nation).
  */
object ScaleUp {
  val KeyOffset = 100000000L // > any key in driver-generated data
  val ChunkCopies = 50 // copies unioned per write job

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val docCopies = if (args.length > 3) args(3).toInt else copies
    val docMode = if (args.length > 4) args(4) else "clone"
    val only =
      if (args.length > 5) args(5).split(",").map(_.trim).toSet
      else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out, copies, docCopies, docMode, only)
    spark.stop()
  }

  /** `only` non-empty restricts the build to the named tables — an
    * in-place single-table rebuild of an existing scaled directory
    * (e.g. re-densifying customer/embeddings under a new docMode
    * without re-writing a 19 GB lineitem). Empty = all tables.
    */
  def build(spark: SparkSession, src: String, out: String,
            copies: Int, docCopiesArg: Int = -1,
            docMode: String = "clone",
            only: Set[String] = Set.empty): Unit = {
    require(docMode == "clone" || docMode == "unique",
      s"docMode must be clone|unique, got '$docMode'")
    val docCopies = if (docCopiesArg > 0) docCopiesArg else copies
    def wanted(t: String) = only.isEmpty || only.contains(t)
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // single-copy shared dims
    if (wanted("region")) {
      read("region").repartition(1).write.mode("overwrite")
        .parquet(s"$out/region.parquet")
      read("nation").repartition(1).write.mode("overwrite")
        .parquet(s"$out/nation.parquet")
      println("scaleup: region, nation written")
    }

    // chunked replicate-and-write: `filesPer10` is the file count per
    // 10 copies (the original tuning point), scaled to the chunk
    def writeReplicated(t: String, filesPer10: Int, n: Int)
                       (perCopy: (DataFrame, Int) => DataFrame): Unit =
      if (wanted(t)) writeReplicatedAlways(t, filesPer10, n)(perCopy)
    def writeReplicatedAlways(t: String, filesPer10: Int, n: Int)
                       (perCopy: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      (0 until n).grouped(ChunkCopies).zipWithIndex.foreach {
        case (chunk, ci) =>
          val df = chunk.map(r => perCopy(base, r)).reduce(_ unionAll _)
          val nFiles = math.max(1, filesPer10 * chunk.size / 10)
          df.repartition(nFiles).write
            .mode(if (ci == 0) "overwrite" else "append")
            .parquet(s"$out/$t.parquet")
      }
      println(s"scaleup: $t written ($n copies)")
    }
    def shiftKeys(df: DataFrame, r: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * KeyOffset)))

    writeReplicated("customer", 4, copies) { (d, r) =>
      val k = shiftKeys(d, r, "c_custkey")
      if (docMode == "clone" || r == 0) k
      else
        // distinct entity per copy: the name's digit string is the
        // shifted key + a 3-digit copy suffix, so canonical-name and
        // last-4-digit blocks no longer collide across copies
        k.withColumn("c_name",
          concat(lit("Customer#"), lpad(
            (col("c_custkey") * 1000L + lit(r.toLong % 1000L))
              .cast("string"), 15, "0")))
    }
    writeReplicated("supplier", 1, copies)(
      (d, r) => shiftKeys(d, r, "s_suppkey"))
    writeReplicated("part", 2, copies)(
      (d, r) => shiftKeys(d, r, "p_partkey"))
    writeReplicated("orders", 16, copies) { (d, r) =>
      shiftKeys(d, r, "o_orderkey", "o_custkey")
        .withColumn("o_orderdate",
          col("o_orderdate") + expr(s"INTERVAL $r SECOND"))
    }
    writeReplicated("lineitem", 32, copies) { (d, r) =>
      shiftKeys(d, r, "l_orderkey", "l_partkey", "l_suppkey")
    }
    writeReplicated("events", 16, copies) { (d, r) =>
      // adapt both generator timestamp layouts (see Tables.events)
      val ts = if (d.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        d.withColumn("ts", col("ts") + lit(r * 1000000000L))
      else d.withColumn("ts", col("ts") + expr(s"INTERVAL $r SECOND"))
      shiftKeys(ts, r, "event_id", "user_id")
    }
    writeReplicated("documents", 16, docCopies) { (d, r) =>
      val k = shiftKeys(d, r, "doc_id")
      if (docMode == "clone")
        k.withColumn("text", concat(col("text"), lit(s" copytag$r")))
          .withColumn("n_chars",
            col("n_chars") + lit(9L + r.toString.length))
      else
        // splice a copy marker every 3 tokens: with word-trigram
        // shingles the cross-copy Jaccard drops to ~1/7 (one shared
        // trigram + three marker trigrams per run), below every LSH
        // banding knee — copies are distinct documents (base
        // near-dup density, docCopies× volume)
        k.withColumn("text", concat(regexp_replace(col("text"),
            "((?:\\S+ ){3})", s"$$1u$r "), lit(s" copytag$r")))
          .withColumn("n_chars", length(col("text")).cast("long"))
    }
    writeReplicated("embeddings", 8, docCopies) { (d, r) =>
      val k = shiftKeys(d, r, "vec_id")
      if (docMode == "clone" || r == 0)
        k.withColumn("embedding", expr(
          s"transform(embedding, (v, i) -> " +
          s"CASE WHEN i = 0 THEN CAST(v + $r * 0.0001 AS FLOAT) ELSE v END)"))
      else
        // copy-keyed Rademacher signs: deterministic hash(i, r)-parity
        // flips preserve the norm and within-copy geometry while
        // cross-copy cosine collapses to ~N(0, 1/sqrt(dim)) — copies
        // are DISTINCT vectors at planted within-copy density
        k.withColumn("embedding", expr(
          s"transform(embedding, (v, i) -> " +
          s"CASE WHEN pmod(hash(i, $r), 2) = 0 THEN v " +
          s"ELSE CAST(-v AS FLOAT) END)"))
    }
  }
}
