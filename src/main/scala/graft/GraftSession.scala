package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode mirrors a cluster deployment: AQE enabled (runtime
  * re-planning, skew-join handling), shuffle partitions sized to the
  * core count rather than the 200 default, UTC session time zone for
  * oracle parity.
  */
object GraftSession {

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(32)

  def builder(cpus: Int = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      // engine extensions: naive range joins auto-rewrite to the
      // bucketed equi-join shape (graft.plans.RewriteRangeJoin)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS); Spark has no ns
      // timestamp type, so read the raw long (Tables.events converts).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming state off the executor heap: the dedup stream keeps
      // one entry per DISTINCT document, which at corpus scale only
      // fits a disk-backed store (the HDFS-backed default is
      // executor-heap and OOMs first)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = defaultCpus): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
