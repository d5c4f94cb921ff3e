package graft.marc

import java.io.{StringReader, StringWriter}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import graft.model.{MarcField, MarcSubfield}
import graft.marc.PublishSplit.PublishRow

/** MARC-XML (MARC21 slim) serialization and parsing — the engine's
  * equivalent of to_marc_xml / parse_xml (marc/helper.py:189-190,
  * alma_publish_parser.py:214-219), as plain row-level functions used
  * inside typed Dataset maps (parse is per-record parallel; a publish
  * FILE source maps each file's record elements in one pass).
  */
object MarcXml {

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** One record → MARC21-slim XML (no surrounding collection element). */
  def toXml(leader: String, fields: Seq[MarcField]): String = {
    val w = new StringWriter
    w.write("""<record xmlns="http://www.loc.gov/MARC21/slim">""")
    w.write(s"<leader>${esc(Option(leader).getOrElse(""))}</leader>")
    fields.foreach { f =>
      if (f.isControl)
        w.write(s"""<controlfield tag="${esc(f.tag)}">${esc(Option(f.data).getOrElse(""))}</controlfield>""")
      else {
        w.write(s"""<datafield tag="${esc(f.tag)}" ind1="${esc(Option(f.ind1).getOrElse(" "))}" ind2="${esc(Option(f.ind2).getOrElse(" "))}">""")
        Option(f.subfields).getOrElse(Seq.empty).foreach { s =>
          w.write(s"""<subfield code="${esc(s.code)}">${esc(Option(s.value).getOrElse(""))}</subfield>""")
        }
        w.write("</datafield>")
      }
    }
    w.write("</record>")
    w.toString
  }

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Parse one or more <record> elements (optionally inside a
    * <collection>) from a MARC-XML string — StAX, streaming, no DOM.
    */
  def parseRecords(xml: String): Seq[PublishRow] = {
    val reader = factory.createXMLStreamReader(new StringReader(xml))
    val records = Seq.newBuilder[PublishRow]
    var leader: String = null
    var fields = Seq.newBuilder[MarcField]
    var tag: String = null
    var ind1: String = null
    var ind2: String = null
    var subs = Seq.newBuilder[MarcSubfield]
    var code: String = null
    val text = new StringBuilder
    var inLeader = false
    var inControl = false
    var inSubfield = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "record" =>
                leader = null; fields = Seq.newBuilder[MarcField]
              case "leader" => inLeader = true; text.setLength(0)
              case "controlfield" =>
                inControl = true
                tag = reader.getAttributeValue(null, "tag")
                text.setLength(0)
              case "datafield" =>
                tag = reader.getAttributeValue(null, "tag")
                ind1 = reader.getAttributeValue(null, "ind1")
                ind2 = reader.getAttributeValue(null, "ind2")
                subs = Seq.newBuilder[MarcSubfield]
              case "subfield" =>
                inSubfield = true
                code = reader.getAttributeValue(null, "code")
                text.setLength(0)
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inLeader || inControl || inSubfield) text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "leader" => leader = text.toString; inLeader = false
              case "controlfield" =>
                fields += MarcField.control(tag, text.toString); inControl = false
              case "subfield" =>
                subs += MarcSubfield(code, text.toString); inSubfield = false
              case "datafield" =>
                fields += MarcField.data(tag, ind1, ind2, subs.result())
              case "record" =>
                val fs = fields.result()
                val mms = fs.find(_.tag == "001").map(_.data).orNull
                records += PublishRow(mms, leader, fs)
              case _ =>
            }
          case _ =>
        }
      }
    } finally reader.close()
    records.result()
  }
}
