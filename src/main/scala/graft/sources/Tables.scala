package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables.
  *
  * All operators read through here so column pruning and predicate
  * pushdown reach the parquet scans (single `spark.read.parquet` per
  * table; Catalyst prunes from the declarative plan).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark has no
    * native type for (read as raw long via
    * `spark.sql.legacy.parquet.nanosAsLong`). Exposes both `ts_ns` (the
    * exact nanosecond long — use for ordering/bucketing, ns-exact parity
    * with engines that keep TIMESTAMP_NS) and `ts` (µs-truncated
    * TimestampType for event-time/streaming ops).
    */
  def events: DataFrame =
    table("events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
