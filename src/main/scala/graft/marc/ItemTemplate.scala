package graft.marc

import graft.model.MarcField

/** Item-JSON templating: an ITM MARC field fills an Alma item-record
  * JSON skeleton by `<$code>` placeholder substitution.
  *
  * Mirrors item-template.json + field_to_item_json
  * (alma_publish_parser.py:251-275): values are JSON-string-escaped,
  * `"<in_temp_location>"` (with quotes) becomes a bare boolean from the
  * perm/temp library+location comparison, and unfilled `<$x>`
  * placeholders are stripped.
  */
object ItemTemplate {

  /** Compact template (keys per the reference's item-template.json). */
  val Template: String =
    """{"bib_data":{"mms_id":"<mms_id>"},""" +
    """"holding_data":{"holding_id":"<$0>","holding_suppress_from_publishing":"false","calculated_suppress_from_publishing":"false","permanent_call_number_type":{"value":"<$j>"},"permanent_call_number":"<$o>","call_number_type":{"value":"<$j>"},"call_number":"<$o>","accession_number":"","copy_id":"<$b>","due_back_date":"<$5>","in_temp_location":"<in_temp_location>","temp_library":{"value":"<$i>"},"temp_location":{"value":"<$t>"},"temp_call_number_type":{"value":"<$l>"},"temp_call_number":"<$q>","temp_call_number_source":"","temp_policy":{"value":""}},""" +
    """"item_data":{"pid":"<$2>","barcode":"<$1>","policy":{"value":"<$c>"},"provenance":{"value":"<$d>"},"description":"<$g>","library":{"value":"<$h>"},"location":{"value":"<$s>"},"pages":"","pieces":"<$3>","requested":false,"creation_date":"<$w>","modification_date":"<$r>","arrival_date":"<$y>","inventory_date":"<$z>","base_status":{"value":"<$x>"},"awaiting_reshelving":false,"physical_material_type":{"value":"<$4>"},"po_line":"","year_of_issue":"","enumeration_a":"<$e>","enumeration_b":"<$u>","enumeration_c":"","enumeration_d":"","enumeration_e":"","enumeration_f":"","enumeration_g":"","enumeration_h":"","chronology_i":"<$f>","chronology_j":"<$v>","chronology_k":"","chronology_l":"","chronology_m":"","break_indicator":{"value":""},"pattern_type":{"value":""},"linking_number":"","type_of_unit":"","receiving_operator":"","process_type":{"value":"<$6>"},"inventory_number":"<$m>","inventory_price":"","alternative_call_number":"","alternative_call_number_type":{"value":"<$k>"},"storage_location_id":"<$n>","public_note":"","fulfillment_note":"","internal_note_1":"","internal_note_2":"","internal_note_3":"<$a>","statistics_note_1":"<$9>","statistics_note_2":"","statistics_note_3":"","physical_condition":{},"committed_to_retain":{},"retention_reason":{"value":""},"retention_note":""}}"""

  private val LeftoverPlaceholder = "<\\$.*?>".r

  /** JSON-string-escape a value without the surrounding quotes
    * (json.dumps then strip quotes, parser line 258). json.dumps runs
    * with ensure_ascii=True, so every char above 0x7E escapes to
    * \\uXXXX too — astral chars as their surrogate pair (Scala's Char
    * iteration already yields UTF-16 surrogates one by one), keeping
    * item_json byte-identical to the reference's output for non-ASCII
    * subfield values.
    */
  def jsonEscape(v: String): String = {
    val sb = new StringBuilder
    v.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private val AnyPlaceholder =
    "\"<in_temp_location>\"|<mms_id>|<\\$([^>]{1,2})>".r

  /** Single-pass fill (same output as the reference's sequential
    * replaces: first subfield per code wins the placeholder, last
    * subfield per code wins the temp-location comparison, unfilled
    * placeholders stripped).
    */
  def fill(template: String, mmsId: String, field: MarcField): String = {
    val subs = Option(field.subfields).getOrElse(Seq.empty)
    val firstByCode = collection.mutable.HashMap.empty[String, String]
    var permLibrary: String = null
    var permLocation: String = null
    var currentLibrary: String = null
    var currentLocation: String = null
    subs.foreach { s =>
      val v = jsonEscape(Option(s.value).getOrElse(""))
      if (!firstByCode.contains(s.code)) firstByCode(s.code) = v
      s.code match {
        case "s" => permLocation = v
        case "t" => currentLocation = v
        case "h" => permLibrary = v
        case "i" => currentLibrary = v
        case _ =>
      }
    }
    val inTemp =
      if (permLocation == currentLocation && permLibrary == currentLibrary) "false"
      else "true"
    AnyPlaceholder.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(m.matched match {
        case "\"<in_temp_location>\"" => inTemp
        case "<mms_id>"               => mmsId
        case _                        => firstByCode.getOrElse(m.group(1), "")
      }))
  }
}
