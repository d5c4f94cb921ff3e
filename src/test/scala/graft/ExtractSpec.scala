package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MarcField, MarcSubfield}
import graft.marc.Extract

/** Unit fixtures for Extract edge paths the generated corpus doesn't
  * reach — hand-computed from marc/helper.py semantics.
  */
class ExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fld(tag: String, ind2: String, subs: (String, String)*) =
    MarcField(tag, " ", ind2, null, subs.map { case (c, v) => MarcSubfield(c, v) })
  private def rec(fields: MarcField*) = Seq(Tuple1(fields.toSeq)).toDF("fields")

  test("publication date: 264 ind2 honors the reference's literal ' 3' list") {
    // reference list is ['1','2',' 3'] — ind2 '3' does NOT match, ' 3' does
    val df = rec(
      fld("264", "3", "c" -> "2001"),
      fld("264", " 3", "c" -> "2002"),
      fld("264", "0", "c" -> "2003"),
      fld("264", "1", "c" -> "2004"))
    assert(df.select(Extract.publicationDate($"fields")).as[String].head()
      == "2002 2004")
  }

  test("isbn: field with $z skipped entirely; >=13-char value preferred") {
    val df = rec(
      fld("020", " ", "a" -> "0123456789", "z" -> "cancelled"), // skipped
      fld("020", " ", "a" -> "0987654", "a" -> "9780987654321"))
    val gotIsbn = df.select(Extract.isbn($"fields")).as[String].head()
    assert(gotIsbn == "9780987654321", s"got $gotIsbn")
    // no >=13 value → first $a
    val short = rec(fld("020", " ", "a" -> "123-456"))
    assert(short.select(Extract.isbn($"fields")).as[String].head() == "123-456")
  }

  test("issn: first 022 without $y/$z wins") {
    val df = rec(
      fld("022", " ", "a" -> "1111-1111", "y" -> "incorrect"),
      fld("022", " ", "a" -> "2222-2222"))
    assert(df.select(Extract.issn($"fields")).as[String].head() == "2222-2222")
  }

  test("oclc: lowercase prefixes accepted, $z fields skipped, 079 included") {
    val df = rec(
      fld("035", " ", "a" -> "(OCoLC)111", "z" -> "old"), // skipped: has $z
      fld("079", " ", "a" -> "ocm22222222"))
    val gotOclc = df.select(Extract.oclcNumber($"fields")).as[String].head()
    assert(gotOclc == "ocm22222222", s"got $gotOclc")
    val none = rec(fld("035", " ", "a" -> "(NotOclc)1"))
    assert(none.select(Extract.oclcNumber($"fields")).as[String].head() == null)
  }

  test("voyager/sierra id: (CtY-L)b… strips prefix and check digit") {
    val sierra = rec(fld("035", " ", "a" -> "(CtY-L)b12345678"))
    assert(sierra.select(Extract.voyagerId($"fields")).as[String].head()
      == "b1234567") // last char dropped, 'b' kept (reference slicing)
    val voyager = rec(fld("035", " ", "a" -> "(CtY)424242-yaledb-Voyager"))
    assert(voyager.select(Extract.voyagerId($"fields")).as[String].head()
      == "424242")
  }

  test("material: python-falsy empty strings dropped from the join") {
    val df = rec(
      fld("300", " ", "b" -> "ill."),
      fld("340", " ", "x" -> "")) // 340 '*' match but empty value
    assert(df.select(Extract.material($"fields")).as[String].head() == "ill.")
  }

  test("subfieldsAsString: first field with a matching subfield wins") {
    val df = rec(
      fld("300", " ", "z" -> "no match"),
      fld("300", " ", "a" -> "xii p.", "c" -> "24 cm"),
      fld("300", " ", "a" -> "later"))
    assert(df.select(Extract.subfieldsAsString($"fields", "300", "acef"))
      .as[String].head() == "xii p. 24 cm")
  }

  test("author concatenates 100/110/111 across fields, skipping $0") {
    val df = rec(
      fld("100", " ", "a" -> "Smith, A.", "0" -> "id-1"),
      fld("110", " ", "a" -> "Corp Body"),
      fld("111", " ", "a" -> "Meeting,"))
    // join then trim: trailing comma removed by the punct fixpoint
    assert(df.select(Extract.author($"fields")).as[String].head()
      == "Smith, A. Corp Body Meeting")
  }
}
