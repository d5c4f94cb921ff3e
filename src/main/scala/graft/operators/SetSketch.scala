package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.KmvSketchAgg

/** Set-cardinality algebra over KMV sketches ([[KmvSketchAgg]]) —
  * audience-overlap style analytics: distinct counts per group plus
  * pairwise union/intersection estimates, the query HLL cannot answer
  * (HLL unions but never intersects).
  *
  * Scale shape: ONE corpus pass aggregates a bounded O(k) sketch per
  * group (map-side partial sketches merge associatively through the
  * shuffle); the per-group sketches — G·k longs, model-sized — come
  * to the driver, where all G² pair combinations run on arrays. The
  * corpus is never self-joined: at 100 TB the exact SQL alternative
  * (`a JOIN b ON value GROUP BY pair`) shuffles the corpus G times,
  * this shuffles G sketches.
  */
object SetSketch {

  /** A materialized KMV sketch: ascending sign-flipped hashes. */
  final case class Kmv(k: Int, hashes: Array[Long]) {
    /** Below k retained values the sketch IS the distinct hash set. */
    def isExact: Boolean = hashes.length < k

    /** Fraction of the hash space at and below h (unsigned). */
    private def frac(h: Long): Double =
      (h.toDouble - java.lang.Long.MIN_VALUE.toDouble) / 1.8446744073709552E19

    /** Distinct-count estimate: exact in the exact regime, else the
      * standard KMV estimator (k−1)/u_k, rounded to long.
      */
    def estimate: Long =
      if (isExact) hashes.length.toLong
      else Math.round((k - 1).toDouble / frac(hashes(k - 1)))

    /** Union sketch (same k): merged k smallest distinct hashes. */
    def union(o: Kmv): Kmv = {
      require(k == o.k, s"sketch k mismatch: $k vs ${o.k}")
      val merged = new java.util.TreeSet[java.lang.Long]()
      hashes.foreach(h => KmvSketchAgg.add(merged, h, k))
      o.hashes.foreach(h => KmvSketchAgg.add(merged, h, k))
      val out = new Array[Long](merged.size)
      val it = merged.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      Kmv(k, out)
    }

    /** Intersection estimate (theta device): θ = the smaller of the
      * two retention thresholds; count common hashes below θ, scale
      * by 1/θ. Exact when both sketches are exact.
      */
    def intersect(o: Kmv): Long = {
      require(k == o.k, s"sketch k mismatch: $k vs ${o.k}")
      val thetaA = if (isExact) 1.0 else frac(hashes(k - 1))
      val thetaB = if (o.isExact) 1.0 else frac(o.hashes(o.k - 1))
      val theta = math.min(thetaA, thetaB)
      var common = 0L
      var i = 0
      var j = 0
      while (i < hashes.length && j < o.hashes.length) {
        val c = java.lang.Long.compare(hashes(i), o.hashes(j))
        if (c == 0) {
          if (theta >= 1.0 || frac(hashes(i)) < theta) common += 1
          i += 1; j += 1
        } else if (c < 0) i += 1
        else j += 1
      }
      if (theta >= 1.0) common else Math.round(common / theta)
    }
  }

  def fromSeq(k: Int, hashes: Seq[Long]): Kmv = Kmv(k, hashes.toArray)

  /** Per-group sketches of `valueCol`: (group, sketch array<long>). */
  def groupSketches(df: DataFrame, groupCol: String, valueCol: String,
                    k: Int): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(KmvSketchAgg(col(valueCol), k).as("sketch"))

  /** Pairwise overlap report: for every unordered group pair
    * (grp_a < grp_b), distinct counts per side plus union and
    * intersection estimates — all EXACT while groups stay in the
    * sketch's exact regime. One corpus pass; pairing is driver-side
    * on the model-sized sketch table.
    */
  def audienceOverlap(df: DataFrame, groupCol: String, valueCol: String,
                      k: Int): DataFrame = {
    val spark = df.sparkSession
    val sketches: Array[(String, Kmv)] = groupSketches(df, groupCol, valueCol, k)
      .collect()
      .map(r => (r.getString(0), fromSeq(k, r.getSeq[Long](1))))
      .sortBy(_._1)
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ga, sa) = sketches(i)
      val (gb, sb) = sketches(j)
      Row(ga, gb, sa.estimate, sb.estimate, sa.union(sb).estimate,
        sa.intersect(sb))
    }
    val schema = StructType(Seq(
      StructField("grp_a", StringType, nullable = false),
      StructField("grp_b", StringType, nullable = false),
      StructField("n_a", LongType, nullable = false),
      StructField("n_b", LongType, nullable = false),
      StructField("n_union", LongType, nullable = false),
      StructField("n_intersect", LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }
}
