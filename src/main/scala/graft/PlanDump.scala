package graft

/** Print one query's pre-AQE physical plan at a given SF dir —
  * the adjudication companion of [[ScalePlanCheck]]: when the diff
  * flags a flip (or a cartesian), this dumps the actual join nodes so
  * the §5 table can say WHICH join moved and why that is (or is not)
  * fine. Usage: `runMain graft.PlanDump <sfDir> <key> [grepNode]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <key> [grepNode]")
    val spark = GraftSession.builder(8)
      .config("spark.local.dir",
        s"/tmp/graft_plandump_${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.sparkPlan.toString
    if (args.length > 2) {
      // print each matching node with a little context
      plan.split("\n").zipWithIndex.foreach { case (l, i) =>
        if (l.contains(args(2)))
          println(f"$i%4d: ${l.take(400)}")
      }
    } else println(plan)
    spark.stop()
  }
}
