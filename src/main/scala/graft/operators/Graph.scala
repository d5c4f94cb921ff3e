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
      .distinct()
    // r12 (guide §2.4): attach the out-degree to the edge list ONCE
    // and cache the result laid out BY src — r11 re-aggregated outDeg
    // from the cache and re-exchanged both e and outDeg on src inside
    // EVERY iteration's plan. The pre-join is associativity-neutral
    // ((e⋈rank)⋈od ≡ (e⋈od)⋈rank — od is keyed 1:1 on src), so the
    // per-edge integer contribution is unchanged bit for bit.
    val eo = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg")), "src")
      .repartition(col("src"))
      .persist()
    val nodes = eo.select(col("src").as("id"))
      .union(eo.select(col("dst").as("id"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val init = 1000000L / n
    val base = (init * (100 - dampPct)) / 100

    var rank = nodes.select(col("id"), lit(init).as("rank_micro"))
    for (i <- 1 to iterations) {
      // per round: the rank attach reads eo co-partitioned (rank's own
      // layout follows the id-keyed join below), and the only
      // edge-sized exchange is the contribution groupBy hop
      val sums = eo
        .join(rank.select(col("id").as("src"), col("rank_micro")), "src")
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
    eo.unpersist()
    nodes.unpersist()
    rank
  }

  /** Per-node triangle counts over an undirected edge list — the
    * clustering/cohesion primitive (co-purchase cliques, co-citation
    * density, link-farm detection in crawl curation).
    *
    * Algorithm: the degree-ordered node-iterator (the MapReduce
    * triangle-count classic). Canonical undirected edges `(a < b,
    * distinct, self-loops dropped)` are ORIENTED from the lower to the
    * higher endpoint under the total order `(degree, id)`; every
    * triangle then has exactly one apex whose two triangle edges both
    * point out, so wedges are generated once (apex self-join) and
    * closed once (join against the canonical edge set). Orientation is
    * what bounds the wedge join: out-degree under the degree order is
    * `O(√m)` for any graph, so wedges are `O(m^1.5)` total instead of
    * `Σ deg²` — in a star graph every edge orients leaf→hub (leaves
    * have degree 1), the hub has no out-edges, and the quadratic hub
    * wedge blowup never happens.
    *
    * Scale shape: three equi-joins (degree attach ×2, wedge self-join
    * on the apex, close join on the wedge pair), all key-partitioned
    * with map-side combine on the final count; nothing reaches the
    * driver. Per-triangle fan-out to its three corners is a 3-row
    * explode, not a shuffle multiplier. Deterministic: no hashing, no
    * RNG — the DuckDB oracle re-derives the identical orientation.
    *
    * The plan references `canon` from several join sites; it is
    * materialized ONCE via an eager localCheckpoint (r12). A persist
    * inside a lazily-returned frame has no sound unpersist point, but
    * checkpoint blocks are reclaimed with the RDD itself, so the
    * operator can own the materialization (guide §5) — the lazy
    * re-derivation this replaced re-ran the whole upstream edge
    * derivation per site.
    *
    * Output: `(id, tri_count)` for every node in ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    // r12: canon is read from three join sites (degree derivation, the
    // degree attach, the closing join) — eager localCheckpoint replaces
    // three re-executions of the upstream edge derivation with one
    // (guide §5; supersedes the r2-r11 "callers should persist" note:
    // checkpoint blocks are reclaimed with the RDD, so the operator can
    // own the materialization without leaking cache entries)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"))
    val e2 = oriented.select(col("u"), col("v").as("w"))
    val wedges = oriented.join(e2, "u").filter(col("v") < col("w"))
    val tris = wedges.join(canon,
      wedges("v") === canon("a") && wedges("w") === canon("b"))
      .select(col("u"), col("v"), col("w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri_count"))
  }

  /** Neighbor-overlap link prediction: for every NON-adjacent node
    * pair sharing ≥ 1 neighbor, the Jaccard of their neighbor sets in
    * integer permille — `1000·common div (deg_a + deg_b − common)` —
    * the classic "customers also bought" / related-document candidate
    * generator.
    *
    * Shape: canonical undirected edges → symmetric adjacency → wedge
    * self-join on the CENTER node (each shared neighbor generates the
    * pair once under `x < y`) → pair-keyed count with map-side
    * combine → degree attach (two key joins) → anti-join against the
    * edge set (predictions are new links only). Deterministic: no
    * hashing, no RNG, integer permille.
    *
    * Honest cost note: wedge generation is `Σ_c deg(c)²` over wedge
    * CENTERS — exact Jaccard needs every common neighbor, so the
    * triangle count's degree-orientation bound does NOT apply. On
    * graphs with unbounded hubs, cap or drop hub centers upstream
    * (the standard mitigation; a hub shared by everyone predicts
    * nothing anyway — its Jaccard is ~0 for all pairs). `maxDegree`
    * enforces that cap here: wedge centers with degree > maxDegree
    * are excluded FROM CENTERING ONLY (documented approximation —
    * common-counts through dropped hubs are forgone; degrees in the
    * denominator stay exact). `maxDegree = 0` disables the cap.
    */
  def jaccardNeighbors(edges: DataFrame, srcCol: String, dstCol: String,
                       minPermille: Int = 0, maxDegree: Int = 0): DataFrame = {
    require(minPermille >= 0 && minPermille <= 1000,
      s"minPermille in [0,1000], got $minPermille")
    require(maxDegree >= 0, s"maxDegree must be >= 0, got $maxDegree")
    // r12 (guide §5): canon / deg / centers are each consumed from
    // MULTIPLE join sites below (adj twice, the degree attaches, the
    // wedge self-join, the anti-join) — as lazy lineage every site
    // re-executed the upstream edge derivation (for the co-purchase
    // queries: a lineitem self-join + distinct, rebuilt up to 5×).
    // Eager localCheckpoints materialize each once; edge/node-sized
    // frames, blocks reclaimed with the RDD. The self-join then reads
    // BOTH sides from one c-partitioned checkpoint — zero exchange.
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val adj = canon.select(col("a").as("c"), col("b").as("x"))
      .unionAll(canon.select(col("b").as("c"), col("a").as("x")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val centers = (
      if (maxDegree == 0) adj.repartition(col("c"))
      else adj.join(deg.filter(col("d") <= maxDegree).select("c"), "c")
    ).localCheckpoint(true)
    val wedges = centers.join(centers.select(col("c"), col("x").as("y")), "c")
      .filter(col("x") < col("y"))
    val common = wedges.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("common_neighbors"))
    val scored = common
      .join(deg.select(col("c").as("x"), col("d").as("__dx")), "x")
      .join(deg.select(col("c").as("y"), col("d").as("__dy")), "y")
      .select(col("x").as("id_a"), col("y").as("id_b"),
        col("common_neighbors"),
        expr("1000 * common_neighbors div (__dx + __dy - common_neighbors)")
          .as("jaccard_permille"))
    scored
      .join(canon, scored("id_a") === canon("a") && scored("id_b") === canon("b"),
        "left_anti")
      .filter(col("jaccard_permille") >= minPermille)
  }

  /** Multi-source BFS hop distance over an undirected edge list:
    * every node within `maxHops` of the source set, labeled with its
    * exact hop distance — the reachability/crawl-depth primitive
    * (seed-page distance in crawl curation, blast-radius queries in
    * warehouse lineage graphs).
    *
    * Frontier algorithm, one round per hop: neighbors of the current
    * frontier not yet labeled get distance r (simultaneous, so the
    * label IS the true shortest hop count — BFS order is the only
    * order). Each round is one adjacency join + one anti-join against
    * the settled set, both key-partitioned; the settled/frontier
    * frames are node-sized and localCheckpoint-truncated per round
    * (the CC loop discipline — the round count is data-dependent and
    * the frontier count doubles as the empty-fixpoint test). Same
    * verifiability device as [[kCore]]: the result after r rounds is
    * a pure function of (edges, sources, r) and an early-converged
    * run equals any longer unroll, so a SQL oracle unrolls exactly
    * `maxHops` rounds.
    *
    * Output: `(id, dist)` — sources at 0 (deduped; sources outside
    * the edge list simply stay isolated at 0), reached nodes ≤
    * maxHops.
    */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
                  sources: DataFrame, sourceIdCol: String,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"maxHops in [1,64], got $maxHops")
    val base = edges
      .select(col(srcCol).cast("long").as("c"), col(dstCol).cast("long").as("x"))
      .filter(col("c") =!= col("x"))
    // r12 (guide §2.4): adjacency laid out BY the frontier join key —
    // the per-round expansion join reads both sides exchange-free (the
    // frontier is id-partitioned from its round's checkpoint)
    val adj = base
      .unionAll(base.select(col("x").as("c"), col("c").as("x")))
      .distinct().repartition(col("c")).persist()
    var settled = sources.select(col(sourceIdCol).cast("long").as("id"))
      .distinct().select(col("id"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = settled.select("id")
    var r = 1
    var exhausted = false
    while (!exhausted && r <= maxHops) {
      val next = adj.join(frontier.withColumnRenamed("id", "c"), "c")
        .select(col("x").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(r).as("dist"))
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        settled = settled.unionAll(next).localCheckpoint(true)
        frontier = next.select("id")
        r += 1
      }
    }
    adj.unpersist()
    settled
  }

  /** k-core membership by iterated peeling: rounds of "drop every
    * node whose degree in the SURVIVING subgraph is < k"
    * (simultaneous removal per round) until fixpoint or `maxRounds`.
    * The dense-cohesion filter: crawl-graph link farms, co-purchase
    * communities, citation cores.
    *
    * Determinism/verifiability contract: the result after r rounds is
    * a pure function of (edges, k, r), and a CONVERGED run equals any
    * longer unroll — so a SQL oracle that unrolls exactly `maxRounds`
    * rounds matches whether or not the Spark loop exits early. Each
    * round is one degree aggregation over edges semi-joined to the
    * alive set (all key-partitioned, map-side combine); the alive
    * frame is node-sized and localCheckpoint-truncated every round
    * (the unbounded-round discipline of the CC loop — each round's
    * count doubles as the fixpoint test and the checkpoint action).
    *
    * Output: `(id, core_degree)` — surviving nodes with their degree
    * inside the surviving subgraph.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, maxRounds: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1 && maxRounds <= 64,
      s"maxRounds in [1,64], got $maxRounds")
    // r12 (guide §2.4): lay the cached edge list out BY `a` so every
    // round's first alive-semijoin reads it co-partitioned (the alive
    // checkpoints are id-partitioned from their groupBy, so the alive
    // sides of both joins are exchange-free after the rename)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().repartition(col("a")).persist()
    def degrees(alive: DataFrame): DataFrame = {
      val live = canon
        .join(alive.select(col("id").as("a")), "a")
        .join(alive.select(col("id").as("b")), "b")
      live.select(col("a").as("id")).unionAll(live.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("core_degree"))
    }
    var alive = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id"))).distinct()
      .localCheckpoint(true)
    var n = alive.count()
    var round = 0
    var done = n == 0L
    while (!done && round < maxRounds) {
      val next = degrees(alive).filter(col("core_degree") >= k)
        .select("id").localCheckpoint(true)
      val m = next.count()
      done = m == n // simultaneous-removal fixpoint: nothing dropped
      alive = next
      n = m
      round += 1
    }
    val out = degrees(alive)
    canon.unpersist()
    out
  }

  /** Personalized PageRank (C104 — the SEEDED walk completing
    * [[linkRank]]'s global ranking: teleport mass returns to a seed
    * SET instead of everywhere, so rank measures proximity to the
    * seeds — "more like these" recommendation, seed-expansion
    * curation, related-entity discovery). Same integer micro-unit
    * fixpoint discipline as [[linkRank]]: seeds start at
    * `10⁶ div |S|`, non-seeds at 0; each round every node reads
    * `d·Σ in-contribs + (seed ? (10⁶ div |S|)·(100−d) div 100 : 0)`
    * — all exact integer arithmetic, so a fixed iteration count is a
    * pure function of (edges, seeds, iterations) and the oracle
    * unrolls exactly that many rounds. Dangling-node mass leaks (the
    * [[linkRank]] convention, stated — ranks are a proximity ORDER,
    * not a distribution).
    *
    * Scale shape per round: the [[linkRank]] shape — edge⋈rank and
    * edge⋈outdeg key-aligned joins, map-side-combined contribution
    * sum, node-sized rank frame, lineage truncated every 4th round.
    */
  def personalizedPagerank(edges: DataFrame, srcCol: String,
                           dstCol: String, seeds: DataFrame,
                           seedIdCol: String, iterations: Int,
                           dampPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations must be in [1,20], got $iterations")
    require(dampPct >= 0 && dampPct <= 100,
      s"dampPct in [0,100], got $dampPct")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    // r12: same pre-joined, src-laid-out edge cache as [[linkRank]] —
    // one exchange per round instead of three, zero per-round
    // re-aggregation of the out-degrees
    val eo = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg")), "src")
      .repartition(col("src"))
      .persist()
    val seedIds = seeds.select(col(seedIdCol).cast("long").as("id"))
      .distinct().persist()
    val nS = seedIds.count()
    require(nS > 0, "empty seed set")
    val nodes = eo.select(col("src").as("id"))
      .union(eo.select(col("dst").as("id"))).distinct()
      .join(seedIds.select(col("id"), lit(true).as("__seed")),
        Seq("id"), "left")
      .na.fill(false, Seq("__seed")).persist()
    val init = 1000000L / nS
    val base = (init * (100 - dampPct)) / 100
    var rank = nodes.select(col("id"), col("__seed"),
      when(col("__seed"), init).otherwise(0L).as("rank_micro"))
    for (i <- 1 to iterations) {
      val sums = eo
        .join(rank.select(col("id").as("src"), col("rank_micro")), "src")
        .select(col("dst").as("id"),
          expr("rank_micro div __outdeg").as("__contrib"))
        .groupBy(col("id")).agg(sum(col("__contrib")).as("__s"))
      val next = nodes.join(sums, Seq("id"), "left")
        .select(col("id"), col("__seed"),
          (when(col("__seed"), base).otherwise(0L) +
            expr(s"$dampPct * coalesce(__s, 0L) div 100"))
            .as("rank_micro"))
      rank = if (i % 4 == 0 && i < iterations) next.localCheckpoint(true)
             else next
    }
    val out = rank.select(col("id"), col("rank_micro"))
    eo.unpersist(); seedIds.unpersist(); nodes.unpersist()
    out
  }

  /** Synchronous label propagation (C100 — community detection, the
    * missing member of the graph family: [[linkRank]] ranks,
    * [[kCore]] filters cohesion, [[triangle_count]] measures it,
    * [[jaccardNeighbors]] predicts links — this PARTITIONS the graph
    * into densely-connected communities, the clustering every
    * link-farm / co-purchase / citation analysis wants first): every
    * node starts labeled with its own id; each round, every node
    * simultaneously adopts the label most frequent among its
    * neighbors, ties broken toward the LOWEST label (the determinism
    * rule — classic async LP is run-order-dependent and unverifiable).
    *
    * Determinism/verifiability contract (the [[kCore]] device): the
    * output after exactly `rounds` synchronous rounds is a pure
    * function of (edges, rounds) — the SQL oracle unrolls exactly that
    * many rounds. Note synchronous LP on bipartite-ish structures can
    * 2-cycle rather than converge; a FIXED round count sidesteps the
    * question and keeps both engines in lockstep.
    *
    * Scale shape per round: one adjacency⋈labels equi-join (both
    * node/edge-keyed, the same exchange reused), one (node, label)
    * count, one per-node argmax via struct max — all map-side
    * combined; the label frame is node-sized and localCheckpoint-
    * truncated every round (the Pregel lineage discipline of
    * [[linkRank]]). Nothing corpus-sized reaches the driver.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1,16], got $rounds")
    val base = edges
      .select(col(srcCol).cast("long").as("a"),
              col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // r12 (guide §2.4): adjacency laid out BY the label join key `b`,
    // so each round's label attach reads the cache co-partitioned
    val adj = base
      .unionAll(base.select(col("b").as("a"), col("a").as("b")))
      .distinct().repartition(col("b")).persist()
    var labels = adj.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("community"))
      .localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      labels = adj
        .join(labels.select(col("id").as("b"),
          col("community").as("__nl")), "b")
        .groupBy(col("a").as("id"), col("__nl"))
        .agg(count(lit(1)).as("__c"))
        .groupBy("id")
        .agg(max(struct(col("__c"), (-col("__nl")).as("__m")))
          .as("__best"))
        .select(col("id"), (-col("__best.__m")).as("community"))
        .localCheckpoint(true)
    }
    adj.unpersist()
    labels
  }

  /** HITS hubs-and-authorities (C114 — [[linkRank]]'s directed-role
    * sibling: PageRank ranks by generic endorsement, HITS separates
    * CURATORS from CONTENT — on a bib→part / order→item / crawl
    * link graph the hub score finds the aggregator records and the
    * authority score the canonical targets; on bipartite graphs the
    * two sides get their natural distinct rankings).
    *
    * Determinism contract (the [[linkRank]] device): scores live in
    * integer MICRO-units; each of the FIXED `iterations` rounds runs
    * `auth'_i = Σ_{j→i} hub_j` then rescales to
    * `auth_i = (10⁶·auth'_i) div max(auth')` (max-normalization — the
    * classic L2 norm is irrational; the max keeps every score in
    * [0, 10⁶] with truncating div both engines replay), then the same
    * for `hub'_j = Σ_{j→i} auth_i`. Init: every node 10⁶. Nodes with
    * no in-edges read auth 0, no out-edges hub 0.
    *
    * Scale shape: per round, TWO edge-keyed equi-joins (hub attach on
    * src, auth attach on dst) with map-side-combined sums, plus a
    * 1-row max broadcast each — the Pregel shape of [[linkRank]] with
    * the same fixed-round lineage discipline (localCheckpoint every
    * 4th round). Nothing corpus-sized reaches the driver.
    */
  def hitsScores(edges: DataFrame, srcCol: String, dstCol: String,
                 iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1,10], got $iterations")
    // r12 NOTE — measured and REVERTED, twice: (a) per-round eager
    // localCheckpoint of the twice-consumed auth frame (6.6 → 9.2 s
    // full bench: one extra job per round outweighs the recompute for
    // iterations ≤ 10; the duplicated subtree's exchanges are
    // runtime-REUSED anyway), and (b) dual src-/dst-laid-out edge
    // caches (6.6 → 14.8 s full bench: two cache materializations +
    // per-round alignment to the tiny coalesced cache layout lose to
    // the single distinct-layout cache). The r11 shape stands.
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
              col(dstCol).cast("long").as("dst"))
      .distinct().persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().persist()
    require(nodes.limit(1).count() > 0, "empty graph")
    var scores = nodes.select(col("id"),
      lit(1000000L).as("hub_micro"), lit(1000000L).as("auth_micro"))
    for (i <- 1 to iterations) {
      val authRaw = e
        .join(scores.select(col("id").as("src"), col("hub_micro")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum("hub_micro").as("__a"))
      val authMax = authRaw.agg(max("__a").as("__am"))
      val auth = nodes.join(authRaw, Seq("id"), "left")
        .crossJoin(broadcast(authMax))
        .select(col("id"), expr(
          """CASE WHEN __am > 0
               THEN (1000000 * coalesce(__a, 0L)) div __am
               ELSE 0L END""").as("auth_micro"))
      val hubRaw = e
        .join(auth.select(col("id").as("dst"), col("auth_micro")), "dst")
        .groupBy(col("src").as("id"))
        .agg(sum("auth_micro").as("__h"))
      val hubMax = hubRaw.agg(max("__h").as("__hm"))
      val next = nodes.join(hubRaw, Seq("id"), "left")
        .crossJoin(broadcast(hubMax))
        .join(auth, "id")
        .select(col("id"), expr(
          """CASE WHEN __hm > 0
               THEN (1000000 * coalesce(__h, 0L)) div __hm
               ELSE 0L END""").as("hub_micro"),
          col("auth_micro"))
      scores = if (i % 4 == 0 && i < iterations) next.localCheckpoint(true)
               else next
    }
    e.unpersist()
    nodes.unpersist()
    scores
  }

  /** Seed-set reach / influence report (C119 — the coverage view over
    * [[hopDistance]]'s per-node distances: from a seed set, how much
    * of the graph is inside each radius and how CLOSE the reached
    * mass sits — the spread question under influencer selection,
    * crawl-frontier budgeting, and contamination blast-radius
    * analysis). Per BFS ring: node count, cumulative reach,
    * `coverage_permille = (1000·cum) div n_nodes` over the FULL node
    * universe (edge endpoints ∪ seeds — unreached nodes count in the
    * denominator, the honest coverage), and the cumulative harmonic
    * mass `Σ_{d≥1} n_at(d)·(10⁶ div d)` — the seed set's harmonic
    * centrality in micro units (ring 0 contributes none; exact
    * integers, the per-ring reciprocal floor is the stated rule).
    *
    * Scale shape: [[hopDistance]]'s frontier BFS (key-partitioned
    * joins, node-sized frames, lineage checkpoint per round) plus one
    * ≤(maxHops+1)-row distribution fold — the cumulative sweep rides
    * a HOF fold over the collected ring table, never a window.
    */
  def reachReport(edges: DataFrame, srcCol: String, dstCol: String,
                  sources: DataFrame, sourceIdCol: String,
                  maxHops: Int): DataFrame = {
    val dists = hopDistance(edges, srcCol, dstCol, sources, sourceIdCol,
      maxHops)
    val universe = edges
      .select(col(srcCol).cast("long").as("id"))
      .union(edges.select(col(dstCol).cast("long").as("id")))
      .union(sources.select(col(sourceIdCol).cast("long").as("id")))
      .distinct()
      .agg(count(lit(1)).as("__nn"))
    dists.groupBy(col("dist").cast("long").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .agg(array_sort(collect_list(struct(col("__d"), col("__n"))))
        .as("__a"))
      .crossJoin(broadcast(universe))
      .select(col("__nn"), explode(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum, CAST(0 AS BIGINT) AS harm,
               CAST(array() AS ARRAY<STRUCT<d: BIGINT, n: BIGINT,
                 cum: BIGINT, harm: BIGINT>>) AS out),
        (acc, el) -> struct(acc.cum + el.__n AS cum,
          acc.harm + CASE WHEN el.__d > 0
            THEN el.__n * (1000000 div el.__d) ELSE 0L END AS harm,
          array_append(acc.out, struct(el.__d AS d, el.__n AS n,
            acc.cum + el.__n AS cum,
            acc.harm + CASE WHEN el.__d > 0
              THEN el.__n * (1000000 div el.__d) ELSE 0L END AS harm))
          AS out)).out""")).as("__r"))
      .select(col("__r.d").as("dist"), col("__r.n").as("n_at"),
        col("__r.cum").as("cum_reached"),
        expr("(1000 * __r.cum) div __nn").as("coverage_permille"),
        col("__r.harm").as("harmonic_cum_micro"))
  }

  /** Item-item collaborative-filtering similarity over a bipartite
    * (user, item) interaction table (C115 — the co-occurrence
    * projection under "customers who took A also took B": recommender
    * candidate generation, assortment planning, and the
    * co-engagement graph that [[triangleCounts]] / [[jaccardNeighbors]]
    * then analyze). Per unordered item pair (a < b, generated ONCE):
    * co-count, each item's user count, and two exact integer
    * similarities — `cos2_micro = (10⁶·co²) div (n_a·n_b)` (squared
    * cosine: monotone in cosine, no irrational sqrt — the repo's
    * integer discipline) and `jaccard_permille = (1000·co) div
    * (n_a + n_b − co)`.
    *
    * Scale shape: distinct (user, item) → per-user baskets; users
    * with baskets larger than `maxBasket` are DROPPED ENTIRELY before
    * counting (the hub cap of [[jaccardNeighbors]].maxDegree /
    * source_overlap.maxSources: a user who interacts with everything
    * contributes ~0 discriminating signal but Σ basket² pair rows —
    * documented approximation, exact when all baskets ≤ cap; item
    * counts use the SAME capped universe so the similarity algebra
    * stays internally consistent). Pair generation is a user-keyed
    * self-join bounded by Σ capped-basket²; the pair count aggregation
    * combines map-side. minCo prunes the long singleton tail in-plan.
    */
  def itemCf(interactions: DataFrame, userCol: String, itemCol: String,
             maxBasket: Int = 256, minCo: Long = 2L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val ui = interactions.select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct()
    val kept = ui.groupBy("u").agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBasket)
      .select("u")
    // u-keyed: reuses the distinct exchange. (r12: an eager checkpoint
    // of cui was measured 2.0 → 3.4 s full bench and REVERTED — the
    // three consumers share the u-exchange at runtime, so the
    // materialization bought nothing.)
    val cui = ui.join(kept, "u")
    val itemN = cui.groupBy(col("it")).agg(count(lit(1)).as("__n"))
    val pairs = cui
      .join(cui.select(col("u"), col("it").as("it2")), "u")
      .filter(col("it") < col("it2"))
      .groupBy(col("it").as("item_a"), col("it2").as("item_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    pairs
      .join(itemN.select(col("it").as("item_a"), col("__n").as("n_a")),
        "item_a")
      .join(itemN.select(col("it").as("item_b"), col("__n").as("n_b")),
        "item_b")
      .select(col("item_a"), col("item_b"), col("co"),
        col("n_a"), col("n_b"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * co * co)
          div (CAST(n_a AS DECIMAL(38,0)) * n_b)""").cast("long")
          .as("cos2_micro"),
        expr("(1000 * co) div (n_a + n_b - co)").as("jaccard_permille"))
  }

  /** Local clustering coefficient (C128 — the node-level sibling of
    * [[triangleCounts]]: the triangle COUNT ranks globally, the
    * coefficient `2·tri/(d(d−1))` is the per-node "how clique-like is
    * my neighborhood" signal behind community cores, spam-farm
    * detection, and the transitivity column of every graph report).
    * Exact integers: degrees from the canonical simple graph,
    * triangles from the degree-ordered orientation, `cc_permille =
    * (2000·tri) div (d·(d−1))` for every node with d ≥ 2 (tri = 0
    * nodes INCLUDED — an open neighborhood is a result, not a gap;
    * d ≤ 1 nodes have no defined coefficient and drop).
    *
    * Scale shape: [[triangleCounts]]'s wedge join (its Σ min(du,dv)
    * bound) + one node-sized degree agg + one node-keyed left join.
    */
  def clusteringCoeff(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(triangleCounts(edges, srcCol, dstCol), Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("tri_count"), lit(0L)).as("tri_count"))
      .withColumn("cc_permille",
        expr("(2000 * tri_count) div (degree * (degree - 1))"))
  }

  /** Degree assortativity (C129 — the one-scalar answer to "do hubs
    * link to hubs?": positive on social/citation graphs, negative on
    * web/biology — and the first sanity number a synthetic or sampled
    * graph gets checked against). Pearson correlation of endpoint
    * degrees over DIRECTED edge instances (each undirected edge
    * contributes both orientations — the standard symmetrization, so
    * Sx = Sy exactly and one moment set suffices). Reported on the
    * corr_matrix / [[graft.operators.Behavior.spearmanCorr]] device:
    * `r_sign` + `r2_permyriad = strunc(100·Sxy', Sxx')²` with
    * DECIMAL(38,0) moments (no irrational sqrt; Sxx' = Syy' by the
    * symmetry). Regular graphs (zero degree variance) read null.
    *
    * Scale shape: one canonical-edge distinct, one node-sized degree
    * agg, two key joins to attach endpoint degrees, ONE scalar moment
    * agg (map-side combined). No corpus sort, no window.
    */
  def assortativity(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // r12: pairs is consumed twice by the symmetrizing union —
    // checkpoint once (guide §5) instead of re-running the distinct +
    // two degree joins for each orientation
    val pairs = canon
      .join(deg.select(col("id").as("a"), col("d").as("__da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("__db")), "b")
      .select(col("__da"), col("__db"))
      .localCheckpoint(true)
    val both = pairs.unionAll(
      pairs.select(col("__db").as("__da"), col("__da").as("__db")))
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    both.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(expr("CAST(__da AS DECIMAL(38,0))")).as("__sx"),
        sum(expr("CAST(__da AS DECIMAL(38,0)) * __da")).as("__sxx0"),
        sum(expr("CAST(__da AS DECIMAL(38,0)) * __db")).as("__sxy0"))
      .withColumn("__sxx", expr("__n * __sxx0 - __sx * __sx"))
      .withColumn("__sxy", expr("__n * __sxy0 - __sx * __sx"))
      .select(col("__n").cast("long").as("n_directed_edges"),
        expr("""CASE WHEN __sxx > 0 THEN
                  CAST(sign(__sxy) AS BIGINT) END""").as("r_sign"),
        expr(s"""CASE WHEN __sxx > 0 THEN
                  CAST((${strunc("100 * __sxy", "__sxx")}) *
                       (${strunc("100 * __sxy", "__sxx")}) AS BIGINT)
                END""").as("r2_permyriad"))
  }

  /** Newman modularity of a community assignment (C130 — the SCORE
    * for [[labelPropagation]]'s output: LP always returns *some*
    * labeling; Q = Σ_c [e_c/m − (d_c/2m)²] says whether it found
    * structure (Q ≈ 0: no better than random; Q ≳ 0.3: real
    * communities) — the quality gate before a community table ships
    * into entity resolution or domain-mix curation). Exact integers:
    * m = |canonical edges with BOTH endpoints labeled| (so the
    * invariant Σd_c = 2m holds BY CONSTRUCTION — partial label
    * coverage scores the labeled subgraph rather than silently
    * skewing Q against a larger m), e_c = intra-community edge
    * count, d_c = Σ degrees, one stated sign-trunc'd floor per
    * community: `term_micro = strunc(10⁶·(4·m·e_c − d_c²), 4·m²)`,
    * `q_micro = Σ_c term_micro`.
    *
    * Scale shape: labels attach to the edge list by two node-keyed
    * joins, e_c/d_c are community-sized aggs, the scalar m broadcast
    * — nothing corpus-sized anywhere. Compose: pass
    * [[labelPropagation]] output (or any (id, community) frame).
    */
  def modularityScore(edges: DataFrame, srcCol: String, dstCol: String,
                      labels: DataFrame, idCol: String,
                      communityCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val lab = labels.select(col(idCol).cast("long").as("__id"),
      col(communityCol).cast("long").as("__c"))
    // r12: withC feeds THREE aggregations (m, e_c, d_c×2) — checkpoint
    // once instead of re-running the canon + two label joins per
    // consumer (guide §5; for jaccard_communities the labels input is
    // itself a full LP/CC pipeline, making the re-execution dominant)
    val withC = canon
      .join(lab.select(col("__id").as("a"), col("__c").as("__ca")), "a")
      .join(lab.select(col("__id").as("b"), col("__c").as("__cb")), "b")
      .localCheckpoint(true)
    val m = withC.agg(count(lit(1)).cast("decimal(38,0)").as("__m"))
    val ec = withC.filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c")).agg(count(lit(1)).as("__e"))
    val dc = withC
      .select(col("__ca").as("__c"))
      .unionAll(withC.select(col("__cb").as("__c")))
      .groupBy("__c").agg(count(lit(1)).as("__d"))
    dc.join(ec, Seq("__c"), "left")
      .crossJoin(broadcast(m))
      .withColumn("__num", expr(
        """1000000 * (4 * __m * CAST(coalesce(__e, 0L) AS DECIMAL(38,0))
           - CAST(__d AS DECIMAL(38,0)) * __d)"""))
      .withColumn("__term", expr(
        """CASE WHEN __num < 0 THEN -((-__num) div (4 * __m * __m))
                ELSE __num div (4 * __m * __m) END"""))
      .agg(count(lit(1)).as("n_communities"),
        first(col("__m")).cast("long").as("m_edges"),
        sum(col("__term")).cast("long").as("q_micro"))
  }

  /** Adamic-Adar link prediction (C131 — [[jaccardNeighbors]]' scored
    * sibling: Jaccard treats every common neighbor equally; AA weights
    * each by 1/ln(deg) so a shared RARE neighbor says more than a
    * shared hub — the stronger standard baseline on citation / co-
    * occurrence graphs). For every non-adjacent pair sharing ≥ 1
    * wedge center: `aa_micro = Σ_centers round(10⁶/ln(d_center))` on
    * the quantized-log device (one IEEE log of an integer both
    * engines hold; degree-1 centers are FILTERED before the weight —
    * they can never form a pair anyway, and ln(1) = 0 would blow the
    * quotient up on any engine that materializes it),
    * plus the raw common count. Same hub discipline as
    * [[jaccardNeighbors]]: `maxDegree` caps wedge CENTERS only
    * (documented approximation — a hub shared by everyone carries
    * ~0 AA weight anyway; endpoint degrees play no role here).
    *
    * Scale shape: the jaccardNeighbors wedge join (Σ_c deg(c)² over
    * capped centers) with the weight attached BEFORE the pair agg —
    * one pair-keyed sum with map-side combine, one anti-join against
    * the edge set.
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 minScoreMicro: Long = 0L, maxDegree: Int = 0): DataFrame = {
    require(maxDegree >= 0, s"maxDegree must be >= 0, got $maxDegree")
    // r12: same multi-consumer materialization as [[jaccardNeighbors]]
    // (guide §5) — canon feeds adj twice plus the anti-join, centers
    // feeds both sides of the wedge self-join (read back from one
    // c-partitioned checkpoint, zero exchange)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val adj = canon.select(col("a").as("c"), col("b").as("x"))
      .unionAll(canon.select(col("b").as("c"), col("a").as("x")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2)
    val degKept = if (maxDegree == 0) deg
                  else deg.filter(col("d") <= maxDegree)
    val centers = adj.join(
      degKept.withColumn("__w",
        round(lit(1000000.0) / log(col("d").cast("double")))
          .cast("long")).select("c", "__w"), "c")
      .localCheckpoint(true)
    val scored = centers
      .join(centers.select(col("c"), col("x").as("y")), "c")
      .filter(col("x") < col("y"))
      .groupBy(col("x").as("id_a"), col("y").as("id_b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum("__w").as("aa_micro"))
    scored
      .join(canon,
        scored("id_a") === canon("a") && scored("id_b") === canon("b"),
        "left_anti")
      .filter(col("aa_micro") >= minScoreMicro)
  }
}
