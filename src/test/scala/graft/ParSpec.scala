package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r11 optimization-round spec: the conditional scan rebalance.
  *
  * Contract under test (OPTIMIZATION_r11.md): fanOut inserts ONE
  * keyed exchange to the session's shuffle parallelism when the
  * input's planned partition count is at most half of it — and is a
  * strict NO-OP otherwise (the production-scale case), so no payload
  * shuffle is ever added to an already-parallel scan.
  */
class ParSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import graft.operators.Par

  test("under-split input is rebalanced to the session parallelism") {
    val one = spark.range(1000).coalesce(1).toDF("id")
    assert(one.rdd.getNumPartitions == 1)
    val fanned = Par.fanOut(one, col("id"))
    assert(fanned.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    // values untouched, only placement changes
    assert(fanned.agg(sum("id")).head.getLong(0) == 499500L)
  }

  test("already-parallel input is returned unchanged (no-op at scale)") {
    val n = spark.sessionState.conf.numShufflePartitions
    val wide = spark.range(1000).repartition(n).toDF("id")
    val out = Par.fanOut(wide, col("id"))
    // same plan object — no exchange inserted
    assert(out eq wide)
  }

  test("keyed rebalance is deterministic row placement (hash of key)") {
    val df = spark.range(100).coalesce(1).toDF("id")
    val a = Par.fanOut(df, col("id"))
      .select(spark_partition_id().as("p"), col("id")).collect().toSet
    val b = Par.fanOut(df, col("id"))
      .select(spark_partition_id().as("p"), col("id")).collect().toSet
    assert(a == b) // re-planning yields identical placement, no RNG
  }

  test("kill switch: SPARK_GRAFT_FANOUT=off makes fanOut identity " +
    "(documented A/B knob; env not set in tests, so fanOut is live)") {
    // the env var cannot be toggled in-process; assert the live path
    // plus the documented contract that `off` short-circuits before
    // any planning (see Par.scala — the first guard)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/Par.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(src.contains("SPARK_GRAFT_FANOUT"))
    assert(src.contains("if (off || df.isStreaming) return df"))
  }
}
