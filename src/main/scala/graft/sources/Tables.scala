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
  /** Events with a schema-adaptive timestamp contract. Generators have
    * shipped `events.ts` both as INT64 TIMESTAMP(NANOS) (no native Spark
    * type — read as a raw long via `spark.sql.legacy.parquet.nanosAsLong`)
    * and as plain timestamp[us] (read as TIMESTAMP_NTZ). Either way the
    * loader exposes the same two columns so every operator and oracle is
    * layout-independent:
    *   - `ts_ns`: nanosecond epoch long — ordering/bucketing; `ts_ns div
    *     1000` equals DuckDB's `epoch_us(ts)` under both source types.
    *   - `ts`: µs TimestampType (UTC session) for event-time/streaming.
    */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
  def documents: DataFrame  = table("documents")
  // embeddings deliberately NOT fanned out here (r11 A/B): the vector
  // family's iterative trainers (Lloyd, PQ) re-execute the input plan
  // once per iteration with a driver collect between — an extra
  // exchange per iteration tripled ann_ivfpq. One-pass consumers that
  // profit from a rebalance do it themselves at their entry point.
  def embeddings: DataFrame = table("embeddings")
}
