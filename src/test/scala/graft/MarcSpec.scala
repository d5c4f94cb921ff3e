package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MarcField, MarcSubfield}
import graft.marc.{Iso2709, ItemTemplate, MarcXml, PublishSplit}
import graft.marc.PublishSplit.PublishRow

/** Unit fixtures for the MARC record surgery — hand-computed expected
  * behavior derived by reading alma_publish_parser.py / marc/helper.py
  * (no reference code executed or copied).
  */
class MarcSpec extends AnyFunSuite {

  private def ctl(tag: String, data: String) = MarcField.control(tag, data)
  private def df(tag: String, subs: (String, String)*) =
    MarcField.data(tag, " ", " ", subs.map { case (c, v) => MarcSubfield(c, v) })

  /** A publish record: bib + 2 holdings (one with a voyager-style 009
    * id pair, one with a single 009) + 2 items.
    */
  private def fixture: PublishRow = {
    val fields = Seq(
      ctl("008", "970101s1997    xxu"),
      ctl("001", "998881234508651"),          // 001 not first — must be moved
      ctl("005", "20200101000000.0"),
      // holding group 1: [009 id, 005, 002, 003, 009 leader]
      ctl("009", "1234567"),
      ctl("005", "20210101000000.0"),
      ctl("002", "ta"),
      ctl("003", "0001022u"),
      ctl("009", "00000nx  a22"),
      // holding group 2: starts with 003 → single-009 (leader-only, no
      // original id) group, the len(leaders_and_ids)==1 branch
      ctl("003", "0002033u"),
      ctl("009", "00000ny  a22"),
      df("245", "a" -> "A title /", "c" -> "by Someone."),
      df("852", "b" -> "LIB1", "c" -> "LOC1", "h" -> "QA1", "8" -> "22100018651"),
      df("852", "b" -> "LIB2", "c" -> "LOC2", "h" -> "QB2", "8" -> "22100028651"),
      df("HLD", "8" -> "22100018651", "a" -> "false",
                "1" -> "2020-01-01 00:00:00"),
      df("ITM", "8" -> "22100018651", "0" -> "22100018651", "2" -> "231118651",
                "h" -> "LIB1", "s" -> "LOC1", "i" -> "LIB1", "t" -> "LOC1",
                "x" -> "1", "1" -> "BC1"),
      df("ITM", "8" -> "22100028651", "0" -> "22100028651", "2" -> "231128651",
                "h" -> "LIB2", "s" -> "LOC2", "i" -> "TEMP", "t" -> "TLOC",
                "x" -> "0", "1" -> "BC2"))
    PublishRow("998881234508651", "00000cam a22", fields)
  }

  test("split: bib keeps its controls, 001 first, routed fields removed") {
    val out = PublishSplit.splitRecord(fixture, ItemTemplate.Template)
    assert(out.count(_.kind == "error") == 0)
    val bib = out.find(_.kind == "bib").get
    assert(bib.fields.head.tag == "001")
    assert(bib.fields.map(_.tag) == Seq("001", "008", "005", "245"))
    assert(bib.item_pids == Seq("22100018651", "22100028651")) // bibs_holding_ids
  }

  test("split: holdings synthesized with 001/004/035/005/007/008 + routed fields") {
    val out = PublishSplit.splitRecord(fixture, ItemTemplate.Template)
    val hs = out.filter(_.kind == "holding")
    assert(hs.map(_.holding_id) == Seq("22100018651", "22100028651"))
    val h1 = hs.head
    assert(h1.leader == "00000nx  a22")
    assert(h1.fields.map(_.tag) == Seq("001", "004", "035", "005", "007", "008", "852", "HLD", "ITM"))
    assert(h1.fields.find(_.tag == "035").get.subfield("a")
      .contains("(CtY)1234567-yaledb-Voyager"))
    assert(h1.fields.find(_.tag == "004").get.data == "998881234508651")
    // $8 stripped from routed fields
    assert(h1.fields.find(_.tag == "852").get.subfield("8").isEmpty)
    // holding 2: single-009 group → no synthesized 035, no 005/007;
    // its 003 becomes the holding 008
    val h2 = hs(1)
    assert(h2.leader == "00000ny  a22")
    assert(h2.fields.map(_.tag) == Seq("001", "004", "008", "852", "ITM"))
    assert(h2.fields.find(_.tag == "008").get.data == "0002033u")
    assert(!h2.fields.exists(_.tag == "035"))
  }

  test("split: items filled from template, in_temp_location from perm/temp compare") {
    val out = PublishSplit.splitRecord(fixture, ItemTemplate.Template)
    val items = out.filter(_.kind == "item")
    assert(items.map(_.pid) == Seq("231118651", "231128651"))
    val j1 = items.head.item_json
    assert(j1.contains(""""pid":"231118651""""))
    assert(j1.contains(""""in_temp_location":false"""))
    assert(j1.contains(""""mms_id":"998881234508651""""))
    assert(!j1.contains("<$")) // all placeholders resolved or stripped
    val j2 = items(1).item_json
    assert(j2.contains(""""in_temp_location":true"""))
    assert(j2.contains(""""temp_library":{"value":"TEMP"}"""))
  }

  test("item json escaping: quotes and backslashes survive") {
    val f = df("ITM", "0" -> "22100018651", "2" -> "p1", "g" -> "a \"quoted\" \\ desc")
    val json = ItemTemplate.fill(ItemTemplate.Template, "99x", f)
    assert(json.contains(""""description":"a \"quoted\" \\ desc""""))
  }

  test("marc-xml roundtrip is the identity on the fixture") {
    val r = fixture
    val xml = MarcXml.toXml(r.leader, r.fields)
    val back = MarcXml.parseRecords(xml)
    assert(back.size == 1)
    assert(back.head.leader == r.leader)
    assert(back.head.fields == r.fields)
    assert(back.head.mms_id == r.mms_id)
  }

  test("marc-xml escapes &, <, > in subfield values") {
    val f = Seq(df("264", "b" -> "Distributor & Co. <prints>"))
    val xml = MarcXml.toXml("ldr", f)
    assert(xml.contains("Distributor &amp; Co. &lt;prints&gt;"))
    assert(MarcXml.parseRecords(xml).head.fields == f)
  }

  test("iso-2709 roundtrip is the identity on the fixture") {
    val r = fixture
    val bytes = Iso2709.encode(r.leader, r.fields)
    // leader length field == record length, base address sane
    assert(new String(bytes.take(5)).toInt == bytes.length)
    val (back, next) = Iso2709.decodeOne(bytes, 0)
    assert(next == bytes.length)
    assert(back.fields == r.fields)
    assert(back.mms_id == r.mms_id)
  }

  test("iso-2709 stream decode reads concatenated records") {
    val r = fixture
    val bytes = Iso2709.encode(r.leader, r.fields) ++ Iso2709.encode(r.leader, r.fields)
    assert(Iso2709.decodeAll(bytes).size == 2)
  }

  test("iso-2709 cap: oversized record drops the BIB field, then gives up") {
    // per-field payloads stay under the 4-digit directory length limit;
    // only the record total exceeds 99999
    val chunk = "x" * 3000
    val many500 = (1 to 32).map(_ => df("500", "a" -> chunk))
    val fat = Seq(ctl("001", "1")) ++ many500 ++ Seq(df("BIB", "a" -> "x" * 9000))
    assert(Iso2709.encode("ldr", fat).length > Iso2709.MaxRecordLength)
    val capped = Iso2709.encodeCapped("ldr", fat, "BIB")
    assert(capped.isDefined) // dropping BIB brings it under 99999
    assert(Iso2709.decodeAll(capped.get).head.fields.forall(_.tag != "BIB"))
    val hopeless = Iso2709.encodeCapped("ldr",
      fat ++ (1 to 4).map(_ => df("501", "a" -> chunk)), "BIB")
    assert(hopeless.isEmpty)
  }

  test("utf-8 multibyte values survive both roundtrips (byte-based directory)") {
    val f = Seq(ctl("001", "9"), df("245", "a" -> "Mélange — 中文 täst"))
    assert(MarcXml.parseRecords(MarcXml.toXml("l", f)).head.fields == f)
    assert(Iso2709.decodeAll(Iso2709.encode("l", f)).head.fields == f)
  }
}
