// Ad-hoc timing probe: sbt "runMain graft.Probe <queryName...>"
package graft

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sf).count()
      println(f"[probe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$cnt")
    }
    spark.stop()
  }
}
