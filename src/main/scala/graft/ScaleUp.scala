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
  * This is a PERFORMANCE dataset: distributions are 10 shifted clones
  * of the sf0.1 generator output, good for measuring shuffle/memory/
  * plan behavior at 10× volume, NOT for oracle comparison (the driver
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
  * Usage: `runMain graft.ScaleUp [srcDir] [outDir] [copies] [docCopies]`
  * defaults: /root/testdata/sf0.1 → /tmp/graft_sf1, 10 copies.
  */
object ScaleUp {
  val KeyOffset = 100000000L // > any key in driver-generated data

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val docCopies = if (args.length > 3) args(3).toInt else copies
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out, copies, docCopies)
    spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String,
            copies: Int, docCopiesArg: Int = -1): Unit = {
    val docCopies = if (docCopiesArg > 0) docCopiesArg else copies
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, nFiles: Int): Unit = {
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"scaleup: $t written")
    }
    // single-copy shared dims
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    def replicate(t: String, n: Int = copies)
                 (perCopy: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = read(t)
      (0 until n).map(r => perCopy(base, r)).reduce(_ unionAll _)
    }
    def shiftKeys(df: DataFrame, r: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * KeyOffset)))

    write(replicate("customer")((d, r) => shiftKeys(d, r, "c_custkey")),
      "customer", 4)
    write(replicate("supplier")((d, r) => shiftKeys(d, r, "s_suppkey")),
      "supplier", 1)
    write(replicate("part")((d, r) => shiftKeys(d, r, "p_partkey")),
      "part", 2)
    write(replicate("orders") { (d, r) =>
      shiftKeys(d, r, "o_orderkey", "o_custkey")
        .withColumn("o_orderdate",
          col("o_orderdate") + expr(s"INTERVAL $r SECOND"))
    }, "orders", 16)
    write(replicate("lineitem") { (d, r) =>
      shiftKeys(d, r, "l_orderkey", "l_partkey", "l_suppkey")
    }, "lineitem", 32)
    write(replicate("events") { (d, r) =>
      // adapt both generator timestamp layouts (see Tables.events)
      val ts = if (d.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        d.withColumn("ts", col("ts") + lit(r * 1000000000L))
      else d.withColumn("ts", col("ts") + expr(s"INTERVAL $r SECOND"))
      shiftKeys(ts, r, "event_id", "user_id")
    }, "events", 16)
    write(replicate("documents", docCopies) { (d, r) =>
      shiftKeys(d, r, "doc_id")
        .withColumn("text", concat(col("text"), lit(s" copytag$r")))
        .withColumn("n_chars", col("n_chars") + lit(9L + r.toString.length))
    }, "documents", 16)
    write(replicate("embeddings", docCopies) { (d, r) =>
      shiftKeys(d, r, "vec_id")
        .withColumn("embedding", expr(
          s"transform(embedding, (v, i) -> " +
          s"CASE WHEN i = 0 THEN CAST(v + $r * 0.0001 AS FLOAT) ELSE v END)"))
    }, "embeddings", 8)
  }
}
