package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation.
  *
  * PageRank-style centrality is a standard quality prior over crawled
  * corpora (harmonic/centrality ranks decide crawl frontier and
  * document retention in CCNet/RefinedWeb-style pipelines); the
  * reference's bib↔part link table (mirroring its many-to-many record
  * links) gives the same shape at warehouse scale.
  *
  * Determinism contract (the repo-wide integer discipline): ranks live
  * in integer MICRO-units, every step is integer arithmetic —
  * per-edge contribution `rank div outdeg`, damping `(d·sum) div 100`
  * — so a fixed iteration count yields bit-identical ranks on any
  * engine and any partition layout; the DuckDB oracle unrolls the
  * same iterations in SQL. Truncating `div` matches across engines on
  * the non-negative values used here.
  *
  * Semantics notes, stated because fixed-point PageRank has variants:
  * nodes = distinct src ∪ dst; initial rank = `1e6 div n`; dangling
  * mass is NOT redistributed (a node with no outlinks simply leaks its
  * mass — the common web-graph simplification); base term
  * `((1e6 div n)·(100−damp)) div 100` uses the same truncation order
  * both engines.
  *
  * Scale shape: rank is a node-table-sized frame re-joined to the edge
  * list once per iteration — the Pregel message-passing shape. Both
  * joins partition on the node key (edges on src for contribution,
  * sums on id for update); contributions combine map-side before the
  * shuffle. Nothing corpus-sized reaches the driver — the single
  * driver scalar is `n` (one count action). Iterations are FIXED (an
  * argument), not convergence-tested, so lineage is bounded and no
  * per-round action is needed.
  */
object Graph {

  /** Centrality over a directed edge list; returns (id, rank_micro). */
  def linkRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, dampPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1,20], got $iterations")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct in [0,100], got $dampPct")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().persist()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val init = 1000000L / n
    val base = (init * (100 - dampPct)) / 100

    var rank = nodes.select(col("id"), lit(init).as("rank_micro"))
    for (i <- 1 to iterations) {
      val sums = e
        .join(rank.select(col("id").as("src"), col("rank_micro")), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"),
          expr("rank_micro div __outdeg").as("__contrib"))
        .groupBy(col("id")).agg(sum(col("__contrib")).as("__s"))
      val next = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"$dampPct * coalesce(__s, 0L) div 100"))
            .as("rank_micro"))
      // lineage truncation every FOURTH round, not every round: each
      // eager localCheckpoint is a full job, and a 4-deep join chain
      // neither blows up Catalyst nor hurts fault recovery — the CC
      // loop's per-round discipline exists for its UNBOUNDED round
      // count; here iterations ≤ 20 ⇒ at most 5 materializations
      rank = if (i % 4 == 0 && i < iterations) next.localCheckpoint(true)
             else next
    }
    e.unpersist()
    nodes.unpersist()
    rank
  }
}
