package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Relational}

/** Specs for the storage-layout pair (Z-order, column-stats index) and
  * incremental aggregate maintenance. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- zorderValue -------------------------------------------------------

  test("zorderValue interleaves bits: x even positions, y odd") {
    // x=5 (101), y=3 (011), 3 bits: x bits → 0,4; y bits → 1,3
    // z = 1 + 2 + 8 + 16 = 27
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorderValue(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(out == 27L)
  }

  test("zorderValue: zero maps to zero, single-coordinate identity") {
    val rows = Seq((0L, 0L), (7L, 0L), (0L, 7L)).toDF("x", "y")
      .select(Layout.zorderValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    // x-only: bits at 0,2,4 → 1+4+16 = 21; y-only: bits 1,3,5 → 2+8+32 = 42
    assert(rows == Seq(0L, 21L, 42L))
  }

  // --- zorderStats -------------------------------------------------------

  test("zorderStats: all rows accounted, ranges bound the data") {
    val df = (0L until 256L).flatMap(x => Seq((x % 16, x / 16)))
      .toDF("x", "y")
    val stats = Layout.zorderStats(df, "x", "y", bits = 4, nBuckets = 4)
      .collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 256L)
    // Z-order property on the full 16×16 grid: equal-width Z blocks are
    // quadrants, so every bucket spans at most half of each axis
    stats.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 7L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 7L)
    }
  }

  test("writeZordered: per-file ranges stay dense on both axes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zw").toFile
      .getAbsolutePath + "/t"
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.writeZordered(grid, "x", "y", bits = 6, nFiles = 16, path = dir)
    // read back per actual FILE: both axes must be locally dense —
    // on the 64×64 grid a linear sort by x would leave y spanning the
    // full 0..63 in every file; Z keeps both within a quadrant-ish box
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
           (max("x") - min("x")).as("xspan"),
           (max("y") - min("y")).as("yspan"))
      .collect()
    assert(stats.length == 16)
    assert(stats.map(_.getAs[Long]("n")).sum == 4096L)
    stats.foreach { r =>
      assert(r.getAs[Long]("xspan") <= 31L, r.toString)
      assert(r.getAs[Long]("yspan") <= 31L, r.toString)
    }
  }

  test("writeZordered: selective predicates on BOTH axes skip row groups " +
       "at scan; a linear sort only prunes its leading column") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = java.nio.file.Files.createTempDirectory("graft_zprune").toFile
      .getAbsolutePath
    val zdir = base + "/z"; val ldir = base + "/linear"
    // tiny parquet row groups so one file holds MANY groups — the
    // pruning granularity the reader's min/max stats operate on
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 8 * 1024)
    hc.setInt("parquet.page.size", 2 * 1024)
    try {
      val grid = spark.range(65536).select(
        (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      Layout.writeZordered(grid, "x", "y", bits = 8, nFiles = 16, path = zdir)
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.parquet(ldir)
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size")
      else hc.set("parquet.page.size", oldPage)
    }
    // rows the scan MATERIALIZED (survived row-group/page stats) vs rows
    // the query returned — runtime skipping is the gap between them
    def scanVsResult(dir: String, predCol: String): (Long, Long) = {
      // page-level column-index pruning off: the assertion targets
      // ROW-GROUP stats granularity (and the linear layout's x-tie
      // order happens to be y-sorted, which page stats would exploit)
      val df = spark.read
        .option("parquet.filter.columnindex.enabled", "false")
        .parquet(dir).filter(col(predCol) === 5L)
      val n = df.count(); df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "no FileSourceScanExec in plan")
      (scans.map(_.metrics("numOutputRows").value).sum, n)
    }
    val total = 65536L
    val (zxScan, zxRows) = scanVsResult(zdir, "x")
    val (zyScan, zyRows) = scanVsResult(zdir, "y")
    val (lyScan, lyRows) = scanVsResult(ldir, "y")
    assert(zxRows == 256L && zyRows == 256L && lyRows == 256L)
    // Z layout: BOTH axes prune — the scan materializes a minority of
    // the table (bound leaves headroom for row-group flush boundaries
    // shifting with writer memory state; isolated runs see ~25-30%)
    assert(zxScan < (total * 2) / 5, s"x-predicate on Z layout materialized $zxScan")
    assert(zyScan < (total * 2) / 5, s"y-predicate on Z layout materialized $zyScan")
    // linear-by-x layout: a y predicate prunes (almost) nothing — every
    // x-sorted row group spans the full y range
    assert(lyScan > (total * 9) / 10,
      s"y-predicate on linear layout unexpectedly pruned: $lyScan")
    assert(lyScan > zyScan * 2,
      s"Z should beat linear on the non-leading axis: z=$zyScan linear=$lyScan")
  }

  // --- columnStatsIndex --------------------------------------------------

  test("columnStatsIndex: blocks, milli min/max, null accounting") {
    val df = Seq(
      (1L, Some(1.5), Some(0.1)), (999L, Some(-2.0), None),
      (1000L, None, Some(0.2)), (1500L, None, Some(0.3)))
      .toDF("k", "a", "b")
    val out = Layout.columnStatsIndex(df, "k", 1000L, Seq("a", "b"))
      .orderBy("block").collect()
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getAs[Long]("n") == 2L)
    assert(b0.getAs[Long]("min_a_milli") == -2000L)
    assert(b0.getAs[Long]("max_a_milli") == 1500L)
    assert(b0.getAs[Long]("nulls_a") == 0L && b0.getAs[Long]("nulls_b") == 1L)
    val b1 = out(1)
    // block with only null a: min/max null, nulls counted
    assert(b1.isNullAt(b1.fieldIndex("min_a_milli")))
    assert(b1.getAs[Long]("nulls_a") == 2L)
    assert(b1.getAs[Long]("min_b_milli") == 200L)
  }

  // --- mergeAggDeltas ----------------------------------------------------

  test("mergeAggDeltas: merge == recompute, incl. new and absent keys") {
    val hist = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val delta = Seq((1L, -3.0), (3L, 7.5)).toDF("k", "v") // 3 is NEW
    val base = Relational.aggSnapshot(hist, Seq("k"), "v")
    val merged = Relational.mergeAggDeltas(base, delta, Seq("k"), "v")
      .orderBy("k").collect().map(_.toSeq).toSeq
    val scratch = Relational.aggSnapshot(hist.unionByName(delta), Seq("k"), "v")
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(merged == scratch)
    assert(merged.map(_.head) == Seq(1L, 2L, 3L)) // key 2 untouched, 3 added
  }

  test("mergeAggDeltas associativity: two small deltas == one combined") {
    val hist = spark.range(100).select((col("id") % 7).as("k"),
      (col("id") * 3 % 11).cast("double").as("v"))
    val d1 = spark.range(100, 150).select((col("id") % 5).as("k"),
      (col("id") % 13).cast("double").as("v"))
    val d2 = spark.range(150, 200).select((col("id") % 9).as("k"),
      (col("id") % 17).cast("double").as("v"))
    val base = Relational.aggSnapshot(hist, Seq("k"), "v")
    val stepwise = Relational.mergeAggDeltas(
      Relational.mergeAggDeltas(base, d1, Seq("k"), "v"), d2, Seq("k"), "v")
    val combined = Relational.mergeAggDeltas(base, d1.unionByName(d2),
      Seq("k"), "v")
    assert(stepwise.orderBy("k").collect().map(_.toSeq).toSeq ==
           combined.orderBy("k").collect().map(_.toSeq).toSeq)
  }

  // --- writeBucketed -----------------------------------------------------

  test("writeBucketed: co-bucketed equi-join plans ZERO exchange, " +
       "answers match the plain join, one file per bucket") {
    val a = (1L to 500L).map(i => (i, s"s${i % 3}")).toDF("k", "st")
    val b = (1L to 2000L).map(i => (i % 500 + 1, i * 1.5)).toDF("k", "v")
    val base = new java.io.File("target/graft_warehouse").getAbsolutePath
    Layout.writeBucketed(a, "bkt_a_spec", "k", 8, s"$base/bkt_a_spec")
    Layout.writeBucketed(b, "bkt_b_spec", "k", 8, s"$base/bkt_b_spec")
    // pin broadcast off: a tiny side would broadcast and the planner
    // disables bucketed scans entirely — the at-scale shape is SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_a_spec").join(spark.table("bkt_b_spec"), "k")
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(raw"(?m)^\(\d+\) Exchange".r.findAllIn(plan).isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")
      // the layout changes the plan, never the answer
      val plain = a.join(b, "k")
      assert(j.count() == plain.count())
      assert(j.agg(sum("v")).collect().head.getDouble(0) ==
             plain.agg(sum("v")).collect().head.getDouble(0))
      // one data file per bucket (the repartition-before-write contract)
      val files = new java.io.File(s"$base/bkt_a_spec").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(files == 8, s"expected 8 bucket files, got $files")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      10L * 1024 * 1024)
  }

  test("writeBucketed joined against an UNBUCKETED frame still works " +
       "(one-sided shuffle only)") {
    val a = (1L to 300L).map(i => (i, i % 7)).toDF("k", "grp")
    val base = new java.io.File("target/graft_warehouse").getAbsolutePath
    Layout.writeBucketed(a, "bkt_c_spec", "k", 4, s"$base/bkt_c_spec")
    val other = (1L to 300L by 3).map(i => (i, s"x$i")).toDF("k", "tag")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_c_spec").join(other, "k")
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // exactly ONE exchange: the unbucketed side aligns to the
      // bucketed side's partitioning; the bucketed scan never shuffles
      assert(raw"(?m)^\(\d+\) Exchange".r.findAllIn(plan).size == 1, plan)
      assert(j.count() == 100L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      10L * 1024 * 1024)
  }

  test("compactionPlan: in-order packing, oversized files, per-table reset") {
    val files = Seq(
      ("t1", 1L, 30L), ("t1", 2L, 30L), ("t1", 3L, 30L), ("t1", 4L, 30L),
      // oversized file spans group indexes on its own
      ("t2", 1L, 120L), ("t2", 2L, 10L), ("t2", 3L, 45L),
      ("t3", 9L, 5L)
    ).toDF("tbl", "file_id", "size_bytes")
    val got = Layout.compactionPlan(files, "tbl", "file_id", "size_bytes",
        targetBytes = 50L)
      .orderBy("tbl", "file_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    // t1 exclusive prefixes 0,30,60,90 → groups 0,0,1,1
    // t2: 0,120,130 → groups 0,2,2; t3 restarts at 0
    assert(got == Seq(
      ("t1", 1L, 30L, 0L), ("t1", 2L, 30L, 0L),
      ("t1", 3L, 30L, 1L), ("t1", 4L, 30L, 1L),
      ("t2", 1L, 120L, 0L), ("t2", 2L, 10L, 2L), ("t2", 3L, 45L, 2L),
      ("t3", 9L, 5L, 0L)))
    // every non-final group of t1 reaches the target once closed
    val t1 = got.filter(_._1 == "t1").groupBy(_._4).view
      .mapValues(_.map(_._3).sum).toMap
    assert(t1(0L) >= 50L)
  }

  test("bloomFileIndex/bloomProbe: no false negatives, pruning pays, " +
       "hand-checked bit positions") {
    val rows = spark.range(0, 2000).select(
      col("id"), (col("id") % 20).as("file_id"), col("id").cast("string").as("v"))
    val idx = Layout.bloomFileIndex(rows, "file_id", col("v"),
      mBits = 4096, k = 3)
    // every present value must be a candidate for its own file
    val present = rows.filter(col("id") % 117 === 0)
      .select(col("v").as("probe"), col("file_id"))
    val cand = Layout.bloomProbe(idx, present.select("probe"),
      "probe", mBits = 4096, k = 3)
    val missed = present.join(cand,
      Seq("probe", "file_id"), "left_anti").count()
    assert(missed == 0L, "a Bloom filter must never false-negative")
    // pruning pays: a present value's candidate list is far smaller
    // than the 20-file full scan (false positives allowed, most pruned)
    val avgCand = cand.groupBy("probe").count()
      .agg(avg("count")).as[Double].head()
    assert(avgCand < 6.0, s"expected most files pruned, got avg $avgCand")
    // hand-checked double hashing: value "7" → h1 = 55 (codepoint),
    // h2 = 55; bits (55 + i·56) mod 4096 = 55, 111, 167
    val bits = Layout.bloomProbe(
      Layout.bloomFileIndex(
        Seq((0L, "7")).toDF("file_id", "v"), "file_id", col("v"), 4096, 3),
      Seq("7").toDF("probe"), "probe", 4096, 3)
    assert(bits.count() == 1L)
    val storedBits = Layout.bloomFileIndex(
        Seq((0L, "7")).toDF("file_id", "v"), "file_id", col("v"), 4096, 3)
      .select(explode(col("bits"))).as[Long].collect().toSet
    assert(storedBits == Set(55L, 111L, 167L))
  }
}
