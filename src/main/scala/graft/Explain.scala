package graft

/** Ad-hoc plan inspector: sbt "runMain graft.Explain <queryName...>". */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    args.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
