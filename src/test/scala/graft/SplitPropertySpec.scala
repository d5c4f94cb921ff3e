package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MarcField, MarcSubfield}
import graft.marc.{ItemTemplate, PublishSplit}
import graft.marc.PublishSplit.PublishRow

/** Property-based fuzzing of the publish splitter: for ANY well-formed
  * publish record (control groups matching its holdings, routed fields
  * carrying valid $8s), the split must conserve and route every field
  * correctly. Catches the class of off-by-one/state bugs the scan
  * logic (alma_publish_parser.py:60-195) invites.
  */
class SplitPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 200)(check: A => Unit): Unit = {
    var seed = Seed(7L)
    val params = Gen.Parameters.default
    (1 to cases).foreach { _ =>
      gen.apply(params, seed).foreach(check)
      seed = seed.next
    }
  }

  private def ctl(tag: String, data: String) = MarcField.control(tag, data)
  private def df(tag: String, subs: (String, String)*) =
    MarcField.data(tag, " ", " ", subs.map { case (c, v) => MarcSubfield(c, v) })

  private case class H(hid: String, withVoyagerId: Boolean, items: Int)

  private val genRecord: Gen[(PublishRow, Seq[H])] = for {
    k <- Gen.chooseNum(1, 999999)
    nH <- Gen.chooseNum(1, 5)
    specs <- Gen.listOfN(nH, for {
      v <- Gen.oneOf(true, false)
      ni <- Gen.chooseNum(0, 3)
    } yield (v, ni))
    extraBibFields <- Gen.chooseNum(0, 4)
  } yield {
    val mms = s"99${k}8651"
    val hs = specs.zipWithIndex.map { case ((v, ni), i) =>
      H(s"22${k}0$i${"8651"}", v, ni)
    }
    val fields = Seq.newBuilder[MarcField]
    fields += ctl("008", "080101s2008")
    fields += ctl("001", mms)
    fields += ctl("005", "20200101.0")
    hs.foreach { h =>
      // two-009 group when voyager id present, 003-led single-009 otherwise
      if (h.withVoyagerId) {
        // leading '1' keeps it from ever matching the 22…8651 alma-id
        // shape, so the 035 synthesis branch is always exercised
        fields += ctl("009", "1" + (h.hid.hashCode.abs % 100000))
        fields += ctl("005", "20210101.0")
        fields += ctl("003", "h008data")
        fields += ctl("009", "00000nx  a22")
      } else {
        fields += ctl("003", "h008data")
        fields += ctl("009", "00000ny  a22")
      }
    }
    fields += df("245", "a" -> s"Title $k")
    (1 to extraBibFields).foreach(i => fields += df("500", "a" -> s"note $i"))
    hs.foreach { h =>
      fields += df("852", "b" -> "L", "c" -> "C", "8" -> h.hid)
      (1 to h.items).foreach { j =>
        fields += df("ITM", "8" -> h.hid, "0" -> h.hid,
          "2" -> s"23${h.hid}$j", "h" -> "L", "s" -> "C", "i" -> "L", "t" -> "C")
      }
    }
    (PublishRow(mms, "00000cam a22", fields.result()), hs)
  }

  test("split conserves and routes every field for arbitrary records") {
    forAll(genRecord) { case (row, hs) =>
      val out = PublishSplit.splitRecord(row, ItemTemplate.Template)
      assert(out.count(_.kind == "error") == 0,
        out.filter(_.kind == "error").map(_.error).mkString(";"))
      val bib = out.find(_.kind == "bib").get
      val holdings = out.filter(_.kind == "holding")
      val items = out.filter(_.kind == "item")

      // one holding per distinct $8, in 852 order
      assert(holdings.map(_.holding_id) == hs.map(_.hid))
      // item fan-out matches the ITM count per holding
      assert(items.size == hs.map(_.items).sum)
      hs.foreach { h =>
        assert(items.count(_.holding_id == h.hid) == h.items)
      }
      // bib: 001 first, no routed fields remain, groups removed
      assert(bib.fields.head.tag == "001")
      assert(!bib.fields.exists(f =>
        PublishSplit.holdingIdSubfield(f).isDefined || f.tag == "ITM"))
      assert(!bib.fields.exists(f => f.tag == "009" || f.tag == "003" ||
        f.tag == "002"))
      // every holding got its 852 with $8 stripped; voyager 035 iff the
      // group carried an original id
      holdings.zip(hs).foreach { case (h, spec) =>
        val f852 = h.fields.filter(_.tag == "852")
        assert(f852.size == 1 && f852.head.subfield("8").isEmpty)
        assert(h.fields.exists(_.tag == "035") == spec.withVoyagerId)
        assert(h.fields.find(_.tag == "004").get.data == row.mms_id)
        assert(h.fields.find(_.tag == "001").get.data == spec.hid)
      }
      // field conservation: bib + holdings account for every non-ITM
      // field (each exactly once)
      val totalNonItm = row.fields.count(_.tag != "ITM")
      val routedOrKept = bib.fields.size +
        holdings.map(_.fields.count(x => x.tag == "852" || x.tag == "005")).sum
      // per voyager group: both 009s + the 003 are consumed into
      // leader/id/synthesized fields (the 005 is kept); per plain
      // group: 003 + 009 consumed
      val consumed = hs.map(h => if (h.withVoyagerId) 3 else 2).sum
      assert(routedOrKept + consumed == totalNonItm,
        s"conservation: kept=$routedOrKept consumed=$consumed total=$totalNonItm")
    }
  }
}
