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

  test("triangleCounts: hand-computed counts, edge-list noise tolerated") {
    // triangles {1,2,3} and {2,3,5}; 3-4 is a pendant edge.
    // Per-node: 1→1, 2→2, 3→2, 5→1; node 4 in no triangle → absent.
    // Noise: duplicate edge, reversed duplicate, self-loop.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 5L), (3L, 5L),
                (3L, 4L), (2L, 1L), (1L, 2L), (4L, 4L)).toDF("src", "dst")
    val got = Graph.triangleCounts(e, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 5L -> 1L))
  }

  test("triangleCounts: star graph has no triangles, K4 has C(4,3) per node") {
    val star = (2L to 40L).map(i => (1L, i)).toDF("src", "dst")
    assert(Graph.triangleCounts(star, "src", "dst").count() == 0L)
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(k4, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each node of K4 sits in C(3,2) = 3 of the 4 triangles
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts is a pure function of the edge set (layout)") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 5L), (3L, 5L), (1L, 5L))
      .toDF("src", "dst")
    val a = Graph.triangleCounts(e.repartition(7), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.triangleCounts(e.repartition(1), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
    // K4 again: total triangle incidences divisible by 3
    assert(a.map(_._2).sum % 3 == 0)
  }
}
