package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-column clustering (Z-order) and the
  * per-file column statistics that make clustered layouts pay off as
  * data skipping (the parquet-footer / Iceberg-manifest shape).
  *
  * At 100 TB the win is structural: a table range-partitioned on a
  * Z-value keeps BOTH clustering columns locally dense inside every
  * file, so a predicate on either column prunes most files via the
  * min/max index before a single row is read.
  */
object Layout {

  /** Morton (Z-order) interleaving of the low `bits` bits of two
    * non-negative integer columns: bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1. Pure integer bit arithmetic composed from
    * codegen'd primitives — map-side, engine-exact (no floats
    * anywhere), monotone in the interleaved sense that nearby (x, y)
    * pairs share high-order Z bits.
    */
  def zorderValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: sum ≡ bitwise OR
  }

  /** Z-order clustering diagnostic: assign every row a Z-value over
    * `(xCol, yCol)`, split the Z space into `nBuckets` equal-width
    * blocks (the file-boundary stand-in), and emit per-bucket row
    * counts and min/max of BOTH columns — the exact statistics a
    * data-skipping index would store per file. Tight per-bucket ranges
    * on both columns are the Z-order payoff a linear sort can only
    * give to its leading column.
    *
    * Scale shape: Z-value + bucket are map-side; the max-Z scalar is a
    * 1-row aggregate broadcast back (never a driver round-trip in the
    * plan); one bucket-keyed aggregation (map-side combined) produces
    * the nBuckets-row index.
    */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // the bucket expression computes __z * nBuckets in Long BEFORE the
    // divide: __z occupies 2*bits bits, so the product needs
    // 2*bits + ceil(log2(nBuckets)) <= 63 or it silently wraps negative
    // and produces garbage buckets (bits=31 alone admits z up to 2^62-1)
    val bucketBits = 64 - java.lang.Long.numberOfLeadingZeros(nBuckets - 1L).toInt
    require(2 * bits + bucketBits <= 63,
      s"2*bits + ceil(log2(nBuckets)) must be <= 63 to avoid Long overflow " +
        s"in the bucket product, got bits=$bits nBuckets=$nBuckets")
    val z = df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .withColumn("__z", zorderValue(col("__x"), col("__y"), bits))
    val zmax = z.agg(max(col("__z")).as("__zmax"))
    z.crossJoin(broadcast(zmax))
      .withColumn("bucket", expr(s"__z * $nBuckets div (__zmax + 1)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min("__x").as("min_x"), max("__x").as("max_x"),
           min("__y").as("min_y"), max("__y").as("max_y"))
  }

  /** Write a table physically clustered by the Z-order of two integer
    * columns: range-repartition on the Z-value (equal-ROW-COUNT file
    * boundaries — balanced files even under value skew, unlike
    * [[zorderStats]]'s fixed-width diagnostic blocks), sort within
    * each partition, one parquet file per range. After this layout a
    * predicate on EITHER column prunes most files via parquet footer
    * min/max — the payoff [[columnStatsIndex]] measures.
    */
  def writeZordered(df: DataFrame, xCol: String, yCol: String,
                    bits: Int, nFiles: Int, path: String): Unit =
    df.withColumn("__z", zorderValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Column-statistics index over fixed-width key blocks: per block of
    * `blockSize` consecutive keys (the file-boundary stand-in), row
    * count plus min / max / null count per requested column — the
    * manifest a scan planner consults to skip blocks. One map-side
    * block assignment + one block-keyed aggregation; the index is
    * blocks-sized, never row-sized.
    *
    * Value columns are captured in integer MILLIS (round-half-up) so
    * min/max are engine-exact under the house integer discipline.
    */
  def columnStatsIndex(df: DataFrame, keyCol: String, blockSize: Long,
                       valueCols: Seq[String]): DataFrame = {
    val withBlock = df.withColumn("block",
      expr(s"CAST($keyCol AS BIGINT) div $blockSize"))
    val aggs = valueCols.flatMap { c =>
      val milli = round(col(c) * 1000).cast("long")
      Seq(min(milli).as(s"min_${c}_milli"),
          max(milli).as(s"max_${c}_milli"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    withBlock.groupBy("block")
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Write a frame as a BUCKETED parquet table — Spark's co-located
    * join device, the layout half of "big joins shuffle on their
    * keys": two tables bucketed into the same `nBuckets` on the join
    * key scan as `HashPartitioning(nBuckets)` sources, so their
    * equi-join plans with ZERO Exchange on either side (the
    * no-shuffle sort-merge-bucket join — spec-asserted). At 100 TB
    * this is the difference between re-shuffling a fact table on
    * every join and paying the shuffle ONCE at write time, amortized
    * over every downstream join/aggregation on that key.
    *
    * The frame is pre-repartitioned on the bucket column with the
    * SAME hash Spark's bucket spec uses, so each write task holds
    * exactly one bucket's rows → ONE file per bucket (without it,
    * every task writes a sliver of every bucket — nBuckets × tasks
    * small files, and multi-file buckets can force a Sort back into
    * the join). `sortBy` stamps the per-file sort order into the
    * table spec so the sort-merge join can skip its Sort too.
    *
    * Registered in the session catalog as `table` with an explicit
    * external path (no metastore dependency beyond the in-memory
    * catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, col(bucketCol))
      .write.format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Small-file compaction PLAN: assign each file to a merge group so
    * groups approximate `targetBytes` — the answer to the operational
    * question every 100 TB table eventually asks (streaming ingest and
    * per-batch stores leave thousands of KB-files whose open/footer
    * overhead dominates scans).
    *
    * Deterministic in-order packing, chosen over first-fit-decreasing
    * because it (a) preserves the table's existing sort/ingest order —
    * compacting OUT of order would destroy the clustering that
    * [[writeZordered]]-style layouts paid for — and (b) is a pure
    * windowed prefix-sum both engines re-derive identically:
    * `group_ix = (cumulative size EXCLUSIVE of this file) div target`,
    * so a group closes once its prefix crosses a target multiple and
    * an oversized file simply spans its own group(s). Per-table
    * window, ordered by the file id — partition-keyed, never global;
    * the frame is file-METADATA-sized regardless of data volume.
    *
    * Output: `(table, file_id, size_bytes, group_ix)` — `group_ix`
    * numbers merge groups within each table from 0.
    */
  def compactionPlan(files: DataFrame, tableCol: String, fileIdCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    files.select(col(tableCol), col(fileIdCol), col(sizeCol))
      .withColumn("group_ix",
        expr(s"coalesce(sum($sizeCol) over (partition by $tableCol " +
          s"order by $fileIdCol rows between unbounded preceding " +
          s"and 1 preceding), 0L) div ${targetBytes}L"))
  }

  /** The `k` Bloom bit positions of a string value under classic
    * double hashing (Kirsch–Mitzenmatcher: `bit_i = (h1 + i·(h2+1))
    * mod m`): two independent polynomial rolling hashes
    * (base 31 mod 1e9+7, base 131 mod 1e9+9 — both < 2^30, so the
    * product term stays far from Long overflow at any sane `k`), the
    * `+1` keeps the stride non-zero when `h2 ≡ 0`. Codegen'd map-side
    * integer arithmetic end-to-end; any engine with a fold re-derives
    * the positions exactly (DuckDB `list_reduce` twin).
    */
  def bloomBits(value: Column, mBits: Int, k: Int): Column = {
    require(mBits > 1, s"mBits must be > 1, got $mBits")
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    bloomBitsFromHashes(
      graft.functions.RollingHashExpr(value, 31L, 1000000007L),
      graft.functions.RollingHashExpr(value, 131L, 1000000009L), mBits, k)
  }

  // the two hashes arrive as already-projected columns in the
  // index/probe paths, so each evaluates ONCE per row rather than once
  // per array element
  private def bloomBitsFromHashes(h1: Column, h2: Column,
                                  mBits: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(h1 + lit(i.toLong) * (h2 + lit(1L)), lit(mBits.toLong))): _*)

  /** Per-file Bloom-filter index for EQUALITY pruning — the third leg
    * of the data-skipping family: [[zorderStats]] clusters,
    * [[columnStatsIndex]] prunes ranges via min/max, and this prunes
    * point lookups on high-cardinality columns where min/max spans are
    * useless (a needle key's file range covers everything). One row
    * per file with the SORTED distinct set-bit positions of every
    * value's [[bloomBits]] — the parquet `bloom_filter` footer shape
    * as a queryable frame.
    *
    * Scale shape: bits are generated map-side (explode of a k-element
    * array), then ONE file-keyed aggregation (map-side combined via
    * `collect_set`); the index is `files × ≤mBits` — metadata-sized,
    * broadcastable. No false negatives by construction (a present
    * value's bits are all set — property-spec'd); false-positive rate
    * is the standard `(1 − e^{−kn/m})^k`, deterministic here because
    * the hashes are seed-free.
    */
  def bloomFileIndex(df: DataFrame, fileIdCol: String, value: Column,
                     mBits: Int, k: Int): DataFrame =
    df.select(col(fileIdCol).as("file_id"),
        graft.functions.RollingHashExpr(value, 31L, 1000000007L).as("__h1"),
        graft.functions.RollingHashExpr(value, 131L, 1000000009L).as("__h2"))
      .select(col("file_id"),
        explode(bloomBitsFromHashes(col("__h1"), col("__h2"), mBits, k))
          .as("bit"))
      .groupBy("file_id")
      .agg(sort_array(collect_set(col("bit"))).as("bits"))

  /** Probe a [[bloomFileIndex]]: for each probe value, the files that
    * MIGHT contain it (every probe bit set in the file's Bloom set) —
    * a point-lookup planner that reads zero data files.
    *
    * Shape: BIT-KEYED equi-join, not probe×file cross product. The
    * naive `crossJoin(index) + array_except` does O(set bits per
    * file) work for EVERY (probe, file) pair — quadratic in disguise
    * when the probe set grows with the table (measured at the 10×
    * rehearsal: 296s → the probe side below). Instead: explode probe
    * bits (k rows each) and file bits once, equi-join on the bit,
    * count distinct-bit hits per (probe, file), keep full-house
    * matches. Candidates that share NO bit never meet; per-candidate
    * work is O(1); both shuffles are linear in the exploded frames
    * and AQE handles bit-key skew.
    */
  def bloomProbe(index: DataFrame, probes: DataFrame, probeCol: String,
                 mBits: Int, k: Int): DataFrame = {
    val pb = probes.select(col(probeCol),
        graft.functions.RollingHashExpr(col(probeCol), 31L, 1000000007L)
          .as("__h1"),
        graft.functions.RollingHashExpr(col(probeCol), 131L, 1000000009L)
          .as("__h2"))
      .select(col(probeCol),
        array_distinct(bloomBitsFromHashes(col("__h1"), col("__h2"),
          mBits, k)).as("__pb"))
      .select(col(probeCol), size(col("__pb")).as("__nb"),
        explode(col("__pb")).as("bit"))
    val fb = index.select(col("file_id"), explode(col("bits")).as("bit"))
    pb.join(fb, "bit")
      .groupBy(col(probeCol), col("file_id"), col("__nb"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === col("__nb"))
      .select(col(probeCol), col("file_id"))
  }
}
