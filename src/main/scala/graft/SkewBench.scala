package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Skew harness: one hot key holding ~90% of the fact rows, joined to a
  * non-broadcastable dim (broadcast disabled — with broadcast available
  * a skewed equi-join is a non-problem, the hot key never shuffles).
  * Compares AQE's runtime skew-join splitting against explicit salting
  * at several salt factors. Results recorded in SURVEY.md §6.
  *
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.SkewBench"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder()
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables(spark, sf)

    def facts = t.lineitem.select(
      when(col("l_orderkey") % 10 =!= 0, lit(0L))
        .otherwise(pmod(col("l_orderkey"), lit(25))).as("k"),
      col("l_extendedprice").as("price"))
    // replicate nation into a dim big enough that Spark won't broadcast
    // it even without the threshold override (~ dim of a few 100k rows)
    def dim = t.nation.crossJoin(spark.range(20000).select(col("id")))
      .select(pmod(col("n_nationkey") + col("id") * 25, lit(25)).as("k"),
              concat(col("n_name"), lit("#"), col("id")).as("tag"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[skew] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    facts.count(); dim.count() // warm IO/JIT
    time("plain join (AQE skew on)") {
      facts.join(dim, Seq("k")).count()
    }
    Seq(4, 8, 16, 32).foreach { sfactor =>
      time(s"salted join x$sfactor") {
        Relational.saltedJoin(facts, dim, Seq("k"), sfactor).count()
      }
    }
    spark.stop()
  }
}
