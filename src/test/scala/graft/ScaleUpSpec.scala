package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1-rehearsal replicator must preserve what the perf numbers
  * depend on: exact row multiplication, referential integrity across
  * copies, and per-copy content perturbation (so content-addressed
  * operators see fresh work, not ten exact clones). */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val src = "/root/testdata/sf0.001"
  lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleup")
      .toFile.getAbsolutePath
    ScaleUp.build(spark, src, dir, copies = 3)
    dir
  }

  private def n(dir: String, t: String): Long =
    spark.read.parquet(s"$dir/$t.parquet").count()

  test("row counts: x3 for replicated tables, x1 for shared dims") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(n(out, t) == 3 * n(src, t), t)
    for (t <- Seq("region", "nation"))
      assert(n(out, t) == n(src, t), t)
  }

  test("referential integrity holds across copies") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ok = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey").as("k")).distinct()
    assert(li.join(ok, col("l_orderkey") === col("k"), "left_anti")
      .count() == 0L, "lineitem orphaned from orders")
    val ck = spark.read.parquet(s"$out/customer.parquet")
      .select(col("c_custkey").as("k")).distinct()
    assert(spark.read.parquet(s"$out/orders.parquet")
      .join(ck, col("o_custkey") === col("k"), "left_anti")
      .count() == 0L, "orders orphaned from customer")
    // nation keys of the x3 customer table still resolve in the x1 dim
    val nk = spark.read.parquet(s"$out/nation.parquet")
      .select(col("n_nationkey").as("k")).distinct()
    assert(spark.read.parquet(s"$out/customer.parquet")
      .join(nk, col("c_nationkey") === col("k"), "left_anti")
      .count() == 0L, "customer orphaned from nation")
  }

  test("keys are disjoint across copies and content is perturbed") {
    val d = spark.read.parquet(s"$out/documents.parquet")
    assert(d.select("doc_id").distinct().count() == d.count())
    // no exact text duplicates introduced by replication (copies carry
    // a distinct suffix token); planted dups inside one copy excluded
    // by construction of the source table
    val base = spark.read.parquet(s"$src/documents.parquet")
      .select("text").distinct().count()
    assert(d.select("text").distinct().count() == 3 * base)
    // embeddings perturbed in dim 0, identical elsewhere
    val e = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"), col("embedding")(0).as("d0"))
    val e0 = e.filter(col("vec_id") < ScaleUp.KeyOffset)
    val e1 = e.filter(col("vec_id") >= ScaleUp.KeyOffset &&
                      col("vec_id") < 2 * ScaleUp.KeyOffset)
      .select((col("vec_id") - ScaleUp.KeyOffset).as("vec_id"),
              col("d0").as("d0c"))
    val joined = e0.join(e1, "vec_id")
      .select((col("d0c") - col("d0")).as("delta")).as[Float].collect()
    assert(joined.nonEmpty && joined.forall(d => math.abs(d - 1e-4f) < 1e-6f))
  }

  lazy val uniqueOut: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleup_u")
      .toFile.getAbsolutePath
    ScaleUp.build(spark, src, dir, copies = 3, docCopiesArg = 3,
      docMode = "unique")
    dir
  }

  test("docMode=unique splices a copy marker every 3 tokens — copies " +
       "are distinct docs, not near-dups (cross-copy trigram-shingle " +
       "overlap collapses)") {
    val dir = uniqueOut
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val c1 = d.filter(col("doc_id") >= ScaleUp.KeyOffset &&
        col("doc_id") < 2 * ScaleUp.KeyOffset)
      .select(col("text"), col("n_chars"))
      .as[(String, Long)].collect()
    assert(c1.nonEmpty)
    c1.foreach { case (t, nc) =>
      val toks = t.split("\\s+")
      // one marker per 3 source tokens (plus the tail suffix token)
      val markers = toks.count(_ == "u1")
      val srcToks = toks.length - markers - 1 // minus copytag1
      assert(markers >= srcToks / 3 - 1 && markers <= srcToks / 3 + 1,
        s"markers=$markers srcToks=$srcToks")
      // any 4-token window of the rewritten text contains a marker or
      // the suffix -> at most ONE source trigram survives per 3-run
      assert(toks.sliding(4).forall(w =>
        w.exists(x => x == "u1" || x == "copytag1")) || toks.length < 4)
      assert(nc == t.length.toLong)
    }
    // every rewritten text is distinct from every copy-0 text
    assert(d.select("text").distinct().count() == d.count() ||
      d.select("text").distinct().count() ==
        3 * spark.read.parquet(s"$src/documents.parquet")
          .select("text").distinct().count())
  }

  test("docMode=unique de-clones the relational axes (r11): customer " +
       "names land in distinct blocks per copy; embedding copies are " +
       "norm-preserving but decorrelated (cross-copy cosine far from 1)") {
    val dir = uniqueOut
    val c = spark.read.parquet(s"$dir/customer.parquet")
    // every c_name distinct across the whole 3x table
    assert(c.select("c_name").distinct().count() == c.count())
    // last-4-digit blocking fragment (the fuzzy_entities block key)
    // differs across copies of the SAME base customer
    val blk = c.select(col("c_custkey"),
      expr("""substring(regexp_replace(c_name, '[^0-9]', ''),
        greatest(length(regexp_replace(c_name, '[^0-9]', '')) - 3, 1), 4)
        """).as("blk4"))
    val b0 = blk.filter(col("c_custkey") < ScaleUp.KeyOffset)
    val b1 = blk.filter(col("c_custkey") >= ScaleUp.KeyOffset &&
        col("c_custkey") < 2 * ScaleUp.KeyOffset)
      .select((col("c_custkey") - ScaleUp.KeyOffset).as("c_custkey"),
        col("blk4").as("blk4c"))
    val both = b0.join(b1, "c_custkey")
    assert(both.count() > 0 &&
      both.filter(col("blk4") === col("blk4c")).count() == 0L,
      "copy-1 customers share a last-4-digit block with their base")
    // embeddings: same norm, cosine well below every near-dup knee
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val e0 = e.filter(col("vec_id") < ScaleUp.KeyOffset)
      .select(col("vec_id"), col("embedding").as("a"))
    val e1 = e.filter(col("vec_id") >= ScaleUp.KeyOffset &&
        col("vec_id") < 2 * ScaleUp.KeyOffset)
      .select((col("vec_id") - ScaleUp.KeyOffset).as("vec_id"),
        col("embedding").as("b"))
    val stats = e0.join(e1, "vec_id").select(
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x*y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (s, v) -> s + v)").as("dot"),
      expr("aggregate(a, CAST(0 AS DOUBLE), (s, v) -> s + v*v)").as("na"),
      expr("aggregate(b, CAST(0 AS DOUBLE), (s, v) -> s + v*v)").as("nb"))
      .select((col("dot") / sqrt(col("na") * col("nb"))).as("cos"),
        (abs(col("na") - col("nb")) / col("na")).as("normdelta"))
      .as[(Double, Double)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (cos, nd) =>
      assert(math.abs(cos) < 0.9, s"cross-copy cosine $cos still near 1")
      assert(nd < 1e-5, s"norm not preserved (delta $nd)")
    }
  }
}
