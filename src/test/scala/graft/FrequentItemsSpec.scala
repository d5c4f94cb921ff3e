package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg

/** Misra-Gries sketch aggregate: exactness when capacity ≥ distinct,
  * the classic error bound under eviction, merge associativity
  * (partition-count invariance), and heavy-hitter recall.
  */
class FrequentItemsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int)
      : Map[String, Long] =
    df.agg(MisraGriesAgg(col("w"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .as[(String, Long)].collect().toMap

  // deterministic skewed stream: "hot" 600×, "warm" 120×, 40 cold tokens 3× each
  private def stream = (
    Seq.fill(600)("hot") ++ Seq.fill(120)("warm") ++
    (0 until 40).flatMap(i => Seq.fill(3)(s"cold$i"))
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }

  test("exact when capacity ≥ distinct (any partition layout)") {
    val df = stream.toDF("id", "w")
    val truth = df.groupBy("w").count().as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = sketch(df.repartition(parts, col("id")), cap = 64)
      assert(got == truth, s"parts=$parts")
    }
  }

  test("under eviction: counts within N/(capacity+1), heavy hitters survive") {
    val df = stream.toDF("id", "w").repartition(8, col("id"))
    val n = stream.size
    val cap = 7
    val got = sketch(df, cap)
    val truth = stream.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    assert(got.size <= cap)
    // every reported count is an underestimate within N/(cap+1)
    got.foreach { case (w, c) =>
      assert(c <= truth(w), s"$w overestimated")
      assert(truth(w) - c <= n / (cap + 1), s"$w error too large")
    }
    // items with true count > N/(cap+1) are guaranteed present
    val mustSurvive = truth.filter(_._2 > n / (cap + 1)).keySet
    assert(mustSurvive.subsetOf(got.keySet),
      s"missing ${mustSurvive -- got.keySet}")
  }

  test("property fuzz: MG guarantees hold on random zipf-ish streams at random capacities") {
    // deterministic pseudo-random streams (hash-mixed, no RNG state)
    (1 to 8).foreach { trial =>
      val n = 300 + (trial * 2654435761L % 700).toInt
      val vocab = 5 + (trial * 40503 % 60)
      val stream = (0 until n).map { i =>
        // zipf-ish: low token ids much more frequent
        val h = (i * 2654435761L + trial * 97L) & 0x7fffffffL
        val tok = (h % vocab).min(h % (vocab / 2 + 1))
        (i.toLong, s"t$tok")
      }
      val truth = stream.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
      val df = stream.toDF("id", "w").repartition(5, col("id"))
      for (cap <- Seq(3, vocab.toInt / 2 + 1, vocab.toInt + 10)) {
        val got = sketch(df, cap)
        assert(got.size <= cap, s"trial=$trial cap=$cap oversize")
        got.foreach { case (w, c) =>
          assert(c <= truth(w), s"trial=$trial cap=$cap $w overestimated")
          assert(truth(w) - c <= n / (cap + 1),
            s"trial=$trial cap=$cap $w error ${truth(w) - c} > ${n / (cap + 1)}")
        }
        truth.filter(_._2 > n / (cap + 1)).keySet.foreach { w =>
          assert(got.contains(w), s"trial=$trial cap=$cap heavy hitter $w missing")
        }
        if (cap >= vocab + 10) assert(got == truth, s"trial=$trial exact regime")
      }
    }
  }

  test("approx_top_tokens key: exact-regime sketch equals the SQL top-20") {
    val out = SparkEntry.queries("approx_top_tokens")(
        spark, "/root/testdata/sf0.001")
      .orderBy("rank").as[(Long, String, Long)].collect()
    assert(out.length == 20)
    // ranks are 1..20, counts non-increasing, ties broken by token asc
    assert(out.map(_._1).toSeq == (1L to 20L))
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
    }
    // cross-check against an exact groupBy count
    val truth = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    out.foreach { case (_, t, c) => assert(truth(t) == c, t) }
  }
}
