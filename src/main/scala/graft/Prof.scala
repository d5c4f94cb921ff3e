package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Stage-level profiler for one or more bench keys (guide §1: measure
  * first). Runs each key `PROF_RUNS` times (default 2 — first run pays
  * JIT/fixture, the repeat is the honest number) at `PROF_SF`
  * (default sf0.1) and prints, per stage: wall duration, task count,
  * input/shuffle-read/shuffle-write bytes, and spill — the local-mode
  * stand-in for the Spark UI stage page. With the UI enabled it also
  * dumps the per-operator SQL metrics of the run's slowest SQL
  * executions (the SQL-tab view). Usage:
  *   sbt "runMain graft.Prof <key> [key...]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Prof <key> [key...]")
    val spark = GraftSession.builder()
      .config("spark.ui.enabled", "true")
      .config("spark.ui.port", "4099")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val runs = sys.env.get("PROF_RUNS").flatMap(_.toIntOption).getOrElse(2)
    case class St(id: Int, name: String, ms: Long, tasks: Int, input: Long,
                  sr: Long, sw: Long, spill: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        val scopes = si.rddInfos.sortBy(_.id).flatMap(r =>
          r.scope.map(_.name).orElse(Some(r.name))).distinct.mkString(">")
        stages += St(si.stageId, scopes.take(120), ms,
          si.numTasks, m.inputMetrics.bytesRead,
          m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.memoryBytesSpilled)
      }
    })
    args.foreach { key =>
      (1 to runs).foreach { r =>
        stages.clear()
        SparkEntry.resetCaches(spark)
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(key)(spark, sf).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // let the listener bus drain
        println(f"##### $key run $r: $wall%.2fs rows=$cnt " +
          f"stages=${stages.size} stageSumMs=${stages.map(_.ms).sum}")
        if (r == runs) {
          stages.sortBy(-_.ms).take(12).foreach { s =>
            println(f"  stage${s.id}%5d ${s.ms}%6dms t=${s.tasks}%3d " +
              f"in=${s.input/1024}%8dK sr=${s.sr/1024}%7dK " +
              f"sw=${s.sw/1024}%7dK spill=${s.spill/1024}%6dK  ${s.name}")
          }
          // SQL-tab view: per-operator metrics of the slowest executions
          try {
            val app = spark.sparkContext.applicationId
            def get(u: String) = {
              val c = new java.net.URI(u).toURL.openConnection()
              scala.io.Source.fromInputStream(c.getInputStream).mkString
            }
            val sqls = get(s"http://localhost:4099/api/v1/applications/$app/sql?length=500")
            // crude JSON scan: id + duration
            val entries = "\"id\" : (\\d+),\\s*\"status\" : \"[A-Z]+\",\\s*\"description\" : \"([^\"]*)\"[\\s\\S]*?\"duration\" : (\\d+)".r
              .findAllMatchIn(sqls).map(m => (m.group(1).toLong, m.group(2), m.group(3).toLong)).toSeq
            entries.sortBy(-_._3).take(3).foreach { case (id, _, dur) =>
              println(s"  == sql $id (${dur}ms) slow operators:")
              val detail = get(s"http://localhost:4099/api/v1/applications/$app/sql/$id?details=true&planDescription=false")
              val nodes = "\"nodeId\" : (\\d+),\\s*\"nodeName\" : \"([^\"]*)\",\\s*\"wholeStageCodegenId\" : ?(\\d*),?\\s*\"metrics\" : \\[([\\s\\S]*?)\\]".r
              nodes.findAllMatchIn(detail).foreach { m =>
                val met = "\"name\" : \"([^\"]*)\",\\s*\"value\" : \"([^\"]*)\"".r
                  .findAllMatchIn(m.group(4))
                  .map(x => x.group(1) + "=" + x.group(2).replace("\\n", " "))
                  .filter(s => s.startsWith("time") || s.startsWith("total time")
                    || s.contains("rows") || s.startsWith("duration")
                    || s.contains("build time") || s.contains("collect time"))
                  .take(4).mkString("; ")
                if (met.nonEmpty) println(s"    node${m.group(1)} ${m.group(2)}: $met")
              }
            }
          } catch { case e: Throwable =>
            println(s"  (sql-tab dump failed: ${e.getMessage})") }
        }
      }
    }
    spark.stop()
  }
}
