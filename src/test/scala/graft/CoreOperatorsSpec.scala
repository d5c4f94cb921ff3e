package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, TextAnalysis, Upsert}
import graft.functions.Normalize

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.builder(cpus = 4).getOrCreate()
}

class CoreOperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("all declared queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every query key has an oracle or a declared rows-only waiver") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      SparkEntry.dynamicOracleQueries -- SparkEntry.rowsOnlyQueries
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without query: $orphan")
    // dynamic-oracle keys must exist, not carry a static oracle, and
    // actually generate SQL for the test corpus
    assert((SparkEntry.dynamicOracleQueries -- SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.dynamicOracleQueries & SparkEntry.oracleSql.keySet).isEmpty)
    val dyn = DynamicOracles.all(spark, sf)
    assert(dyn.keySet == SparkEntry.dynamicOracleQueries,
      s"dynamic oracle generation incomplete: got ${dyn.keySet}")
    dyn.values.foreach(sql => assert(sql.trim.nonEmpty))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("upsert merge: update wins, version bumps, insert gets version 0") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v").withColumn("version", lit(0L))
    val upd = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val out = Upsert.merge(base, upd, Seq("k")).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 0L), (2L, "B", 1L), (3L, "c", 0L)))
  }

  test("upsert merge overwrites with null (postgres DO UPDATE semantics)") {
    val base = Seq((1L, Some("a"))).toDF("k", "v").withColumn("version", lit(0L))
    val upd = Seq((1L, None: Option[String])).toDF("k", "v")
    val out = Upsert.merge(base, upd, Seq("k")).as[(Long, Option[String], Long)].collect()
    assert(out.toSeq == Seq((1L, None, 1L)))
  }

  test("insertOnly keeps existing rows untouched") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val inc = Seq((1L, "X"), (2L, "b")).toDF("k", "v")
    val out = Upsert.insertOnly(base, inc, Seq("k")).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b")))
  }

  test("orphans: child of published parent missing from publish") {
    val db = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("bib", "holding")
    val publish = Seq((1L, 10L)).toDF("bib", "holding")
    val out = Relational.orphans(db, publish, Seq("bib"), Seq("holding"))
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 11L))) // bib 2 not in publish → untouched
  }

  test("lastOfConsecutiveRuns keeps last row of each run") {
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "a")).toDF("ord", "run")
    val out = Relational.lastOfConsecutiveRuns(df, "run", "ord")
      .orderBy("ord").as[(Int, String)].collect().toSeq
    assert(out == Seq((2, "a"), (3, "b"), (4, "a")))
  }

  test("lastOfConsecutiveRuns with partitions: runs never span partition values") {
    val df = Seq((1, "a", 0), (2, "a", 0), (3, "a", 1), (4, "a", 1))
      .toDF("ord", "run", "file")
    val out = Relational.lastOfConsecutiveRuns(df, "run", "ord", Seq("file"))
      .orderBy("ord").as[(Int, String, Int)].collect().toSeq
    // the 'a' run restarts at the file boundary: last-of-run per file
    assert(out == Seq((2, "a", 0), (4, "a", 1)))
  }

  test("chunkIndex assigns global-order chunks without a global window") {
    // scrambled partition layout in: the index must still follow total
    // doc order (equivalent to a global row_number, computed map-side)
    val df = spark.range(0, 1000).toDF("id").repartition(7)
    val out = Relational.chunkIndex(df, "id", 100)
      .as[(Long, Long)].collect()
    assert(out.length == 1000)
    out.foreach { case (id, ix) => assert(ix == id / 100, s"id=$id ix=$ix") }
  }

  test("formatOclc prefixes by digit count") {
    val df = Seq("(OCoLC)12345678", "(OCoLC)123456789", "(OCoLC)1234567890")
      .toDF("raw").select(Normalize.formatOclc($"raw").as("o"))
    assert(df.as[String].collect().toSeq ==
      Seq("ocm12345678", "ocn123456789", "on1234567890"))
  }

  test("wordJaccard exact on known pair") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(TextAnalysis.wordJaccard($"x", $"y").as("j"))
    assert(df.as[Double].head() == 0.5)
  }

  test("suppressFlag matches reference semantics") {
    val df = Seq("false", "true", "anything").toDF("v")
      .select(Normalize.suppressFlag($"v").as("s"))
    assert(df.as[String].collect().toSeq == Seq("N", "Y", "Y"))
  }
}
