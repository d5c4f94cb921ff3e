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

  /** One metric datum — MetricName/Value/Unit + one dimension, the
    * put_metric_data shape of metrics/aws_metrics.py:14-30.
    */
  final case class MetricDatum(namespace: String, name: String, value: Double,
                               unit: String = "Count",
                               dimensionName: String = null,
                               dimensionValue: String = null)

  /** Pluggable emit step: where the reference calls CloudWatch
    * put_metric_data, a deployment drops in its metrics client. The
    * engine half (zero-extra-pass observe) never blocks on emission.
    */
  trait MetricsSink extends Serializable {
    def send(data: Seq[MetricDatum]): Unit
  }

  /** Default sink: structured log lines (no metrics backend here). */
  object LogMetricsSink extends MetricsSink {
    def send(data: Seq[MetricDatum]): Unit = data.foreach { d =>
      println(s"""[metric] {"namespace":"${d.namespace}","name":"${d.name}",""" +
        s""""value":${d.value},"unit":"${d.unit}"""" +
        (if (d.dimensionName != null)
           s""","dimensions":[{"name":"${d.dimensionName}","value":"${d.dimensionValue}"}]"""
         else "") + "}")
    }
  }

  /** send_metric (aws_metrics.py:23-30): a batch of counters under one
    * namespace + shared dimension.
    */
  def sendCounts(sink: MetricsSink, namespace: String,
                 counts: Map[String, Long],
                 dimensionName: String = null,
                 dimensionValue: String = null): Unit =
    sink.send(counts.toSeq.sortBy(_._1).map { case (name, v) =>
      MetricDatum(namespace, name, v.toDouble, "Count",
                  dimensionName, dimensionValue)
    })
}
