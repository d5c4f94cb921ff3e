package graft

/** Broadcast-threshold / join-strategy cliff detector: compare each
  * query's (pre-AQE) physical join strategies at two SF dirs and flag
  * any flip — a dimension that silently crossed
  * `spark.sql.autoBroadcastJoinThreshold` and turned a broadcast join
  * into a full shuffle (or worse, a nested-loop) is exactly the kind
  * of 10×-data regression that stays invisible in value checks.
  *
  * Usage: `runMain graft.ScalePlanCheck <dirA> <dirB> [key1,key2,...]`
  * (defaults: sf0.1 vs /tmp/graft_sf1, all keys). Plans only — nothing
  * executes.
  */
object ScalePlanCheck {
  private val joinNodes = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")

  def strategies(plan: String): Map[String, Int] =
    joinNodes.map(n => n -> n.r.findAllIn(plan).size).filter(_._2 > 0).toMap

  def main(args: Array[String]): Unit = {
    val dirA = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dirB = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet) else None
    // ISOLATED local dirs: some keys execute model-fit jobs at
    // plan-construction time (IVF Lloyd iterations, classifier fits),
    // and the r7 rehearsal's per-key cleanup loop (`rm /tmp/blockmgr-*`
    // between probes) raced those jobs' shuffle files — a handful of
    // keys got skipped for the wrong reason and the plan diff had
    // scheduling-dependent blind spots. A dedicated spark.local.dir
    // makes this tool immune to any default-/tmp cleanup.
    val localDir = s"/tmp/graft_scaleplan_local_${ProcessHandle.current().pid()}"
    val spark = GraftSession.builder()
      .config("spark.local.dir", localDir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flips = 0
    var done = 0
    // sorted: deterministic order so a resumed/partial run is
    // comparable across sessions; one line per KEY (not just per
    // flip) so a long run — sf100 plan-time model fits take minutes
    // for some keys — shows live progress and the artifact records
    // the quiet keys' strategies too
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1))).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val a = strategies(fn(spark, dirA).queryExecution.executedPlan.toString)
          val b = strategies(fn(spark, dirB).queryExecution.executedPlan.toString)
          val danger = b.keySet.exists(k =>
            k.contains("NestedLoop") || k.contains("Cartesian"))
          val secs = (System.nanoTime() - t0) / 1e9
          done += 1
          if (a != b) {
            flips += 1
            println(f"[scaleplan] FLIP $name ($secs%.1fs): $dirA=$a  $dirB=$b")
          } else if (danger)
            // same strategy at both SFs incl. a nested-loop: usually a
            // DELIBERATE 1-row scalar broadcast (corpus totals, norms,
            // max-Z) or the documented brute-force ANN baseline —
            // triage by hand, it is not a scale flip
            println(f"[scaleplan] note $name ($secs%.1fs): stable nested-loop $b")
          else
            println(f"[scaleplan] ok $name ($secs%.1fs): $b")
        } catch {
          case e: Throwable =>
            println(s"[scaleplan] SKIP $name: ${e.getClass.getSimpleName}")
        }
      }
    println(s"[scaleplan] done, $done keys, $flips strategy flips")
    spark.stop()
    // own-dir cleanup (safe: this JVM is the only user and is done)
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(localDir))
  }
}
