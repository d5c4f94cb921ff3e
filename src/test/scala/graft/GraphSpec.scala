package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** linkRank: hand-computed fixpoint, layout invariance, mass bounds. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 1→2, 2→1, 2→3, 3→1: n=3, init=333333, base=(333333*15) div 100=49999
  private def edges =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)).toDF("src", "dst")

  test("two hand-computed iterations") {
    // iter1: sums 1←{166666,333333} 2←{333333} 3←{166666}
    //   r=(474998, 333332, 191665)
    // iter2: sums 1←{166666,191665} 2←{474998} 3←{166666}
    //   r=(354580, 453747, 191665)
    val got = Graph.linkRank(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 354580L, 2L -> 453747L, 3L -> 191665L))
  }

  test("rank is a pure function of the edge set (layout invariance)") {
    val a = Graph.linkRank(edges.repartition(7), "src", "dst", iterations = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.linkRank(edges.repartition(1), "src", "dst", iterations = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
    // truncating integer steps only ever LOSE mass vs the real-valued
    // fixpoint: total stays at or under one micro-unit whole
    assert(a.map(_._2).sum <= 1000000L)
  }

  test("dangling node leaks mass, still gets the base term") {
    // 1→2 only: node 2 has no outlinks; after any iteration its rank
    // is base + damped inflow, node 1 holds base only
    val e = Seq((1L, 2L)).toDF("src", "dst")
    // n=2, init=500000, base=(500000*15) div 100=75000
    // iter1: r(1)=75000, r(2)=75000+(85*500000) div 100=500000
    val got = Graph.linkRank(e, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 75000L, 2L -> 500000L))
  }
}
