package graft

/** Round-11 deliverable dumper: writes `.explain("formatted")` output
  * for each named query to `plans/r11/<key>_<suffix>.txt`.
  * Usage: runMain graft.PlanDumpR11 <suffix> <key> [key...]
  * `SPARK_GRAFT_FANOUT=off` reproduces the pre-r11 plan shape for the
  * fan-out family, so before/after pairs come from the same binary.
  */
object PlanDumpR11 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR11 <suffix> <key...>")
    val suffix = args.head
    val sf = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File("plans/r11")
    dir.mkdirs()
    args.tail.foreach { key =>
      try {
        val df = SparkEntry.queries(key)(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r11/${key}_$suffix.txt"), plan)
        println(s"[plans] wrote ${key}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plans] $key FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
