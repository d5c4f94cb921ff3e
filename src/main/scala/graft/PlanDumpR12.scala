package graft

/** Round-12 deliverable dumper: writes `.explain("formatted")` output
  * for each named query to `plans/r12/<key>_<suffix>.txt` (override the
  * directory with PLAN_DIR — the r11 backfill writes to plans/r11).
  * Usage: runMain graft.PlanDumpR12 <suffix> <key> [key...]
  * Before-plans for r12 come from a `git worktree` of the r11 tree
  * (the r12 changes are operator restructures, not env-gated), so the
  * pairs compare the two committed trees; `SPARK_GRAFT_FANOUT=off`
  * still reproduces the pre-r11 shape for the fanOut family.
  */
object PlanDumpR12 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR12 <suffix> <key...>")
    val suffix = args.head
    val sf = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("PLAN_DIR", "plans/r12")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    args.tail.foreach { key =>
      try {
        val df = SparkEntry.queries(key)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${key}_$suffix.txt"), plan)
        println(s"[plans] wrote $outDir/${key}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plans] $key FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
