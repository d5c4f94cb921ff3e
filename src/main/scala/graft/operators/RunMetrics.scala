package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Run metrics — the reference's global counters + CloudWatch push
  * (alma_publish_parser.py:20-28, 302-308; metrics/aws_metrics.py) —
  * as a zero-extra-pass `observe`: the counters ride along with
  * whatever action materializes the pipeline, instead of separate
  * count() jobs (which would each rescan at 100 TB).
  */
object RunMetrics {

  /** Attach ingest counters to a split-output DataFrame. Read
    * `observation.get` after the first action on the returned frame.
    */
  def observeSplit(split: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("graft_run_metrics")
    val observed = split.observe(obs,
      count(lit(1)).as("records"),
      sum(when(col("kind") === "bib", 1).otherwise(0)).as("bibs"),
      sum(when(col("kind") === "holding", 1).otherwise(0)).as("holdings"),
      sum(when(col("kind") === "item", 1).otherwise(0)).as("items"),
      sum(when(col("kind") === "error", 1).otherwise(0)).as("errors"))
    (observed, obs)
  }
}
