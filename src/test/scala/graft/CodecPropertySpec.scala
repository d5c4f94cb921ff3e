package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MarcField, MarcSubfield}
import graft.marc.{Iso2709, MarcXml}

/** Property-based fuzzing of the MARC codecs: ANY well-formed record
  * must round-trip through MARC-XML and ISO-2709 identically —
  * including multibyte UTF-8, XML-special characters, empty values,
  * and many-subfield fields.
  */
class CodecPropertySpec extends AnyFunSuite {

  /** Deterministic sampling driver (no scalatest-scalacheck bridge in
    * the offline cache): 300 cases per property, fixed seed.
    */
  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit = {
    var seed = Seed(42L)
    val params = Gen.Parameters.default
    (1 to 300).foreach { _ =>
      gen.apply(params, seed).foreach(check)
      seed = seed.next
    }
  }

  private val weirdChars = "aé中ß&<>\"'´—☃x0 _.,;:$"
  private val genValue: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(weirdChars.toSeq)).map(_.mkString))

  private val genTag: Gen[String] = Gen.oneOf(
    "010", "020", "035", "100", "245", "500", "852", "866", "ITM", "BIB")
  private val genCtlTag: Gen[String] = Gen.oneOf("001", "003", "005", "007", "008")
  private val genInd: Gen[String] = Gen.oneOf(" ", "0", "1", "9")
  private val genCode: Gen[String] = Gen.oneOf("a", "b", "z", "8", "0", "2")

  private val genControl: Gen[MarcField] = for {
    t <- genCtlTag
    d <- genValue
  } yield MarcField.control(t, d)

  private val genData: Gen[MarcField] = for {
    t <- genTag
    i1 <- genInd
    i2 <- genInd
    n <- Gen.chooseNum(0, 6)
    subs <- Gen.listOfN(n, for { c <- genCode; v <- genValue }
      yield MarcSubfield(c, v))
  } yield MarcField.data(t, i1, i2, subs)

  private val genRecord: Gen[(String, Seq[MarcField])] = for {
    nc <- Gen.chooseNum(1, 4)
    nd <- Gen.chooseNum(0, 8)
    ctl <- Gen.listOfN(nc, genControl)
    dat <- Gen.listOfN(nd, genData)
    leader <- genValue
  } yield (leader.take(20), ctl ++ dat)

  test("marc-xml roundtrip is the identity for arbitrary records") {
    forAll(genRecord) { case (leader, fields) =>
      val back = MarcXml.parseRecords(MarcXml.toXml(leader, fields))
      assert(back.size == 1)
      assert(back.head.leader == leader)
      assert(back.head.fields == fields)
    }
  }

  test("iso-2709 roundtrip is the identity for arbitrary records") {
    forAll(genRecord) { case (leader, fields) =>
      val bytes = Iso2709.encode(leader, fields)
      val (back, next) = Iso2709.decodeOne(bytes, 0)
      assert(next == bytes.length)
      assert(back.fields == fields)
      // leader comes back ASCII-sanitized and padded to 24
      assert(back.leader.length == 24)
      assert(back.leader.forall(c => c >= 0x20 && c <= 0x7e))
    }
  }

  test("iso-2709 stream decode survives arbitrary concatenations") {
    forAll(Gen.listOfN(3, genRecord)) { recs =>
      val bytes = recs.flatMap { case (l, f) => Iso2709.encode(l, f) }.toArray
      val back = Iso2709.decodeAll(bytes)
      assert(back.map(_.fields) == recs.map(_._2))
    }
  }

  test("iso-2709 decodeAll NEVER throws on corrupted streams") {
    // arbitrary garbage injected between (and truncating) valid
    // records: decode must skip bad chunks and keep going — a poison
    // byte sequence in a 100 TB file scan must not fail the task
    val genGarbage: Gen[Array[Byte]] =
      Gen.chooseNum(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val genCase: Gen[(Array[Byte], Array[Byte], (String, Seq[MarcField]), Int)] =
      for {
        g1 <- genGarbage
        g2 <- genGarbage
        r <- genRecord
        cut <- Gen.chooseNum(0, 100)
      } yield (g1, g2, r, cut)
    forAll(genCase) { case (g1, g2, (l, f), cutPct) =>
      val rec = Iso2709.encode(l, f)
      val truncated = rec.take(rec.length * cutPct / 100)
      // garbage + valid + garbage + truncated-tail: must not throw and
      // must still surface the intact record when the garbage doesn't
      // happen to parse as a record prefix that swallows it
      val out = Iso2709.decodeAll(g1 ++ rec ++ g2 ++ truncated)
      assert(out.size <= 4) // bounded output, no runaway
      // clean leading record always survives
      val cleanFirst = Iso2709.decodeAll(rec ++ g2)
      assert(cleanFirst.headOption.map(_.fields).contains(f))
    }
  }
}
