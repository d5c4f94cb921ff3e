package graft.marc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level MARC field extraction over the nested `fields` array —
  * the brief-record builders from marc/helper.py re-expressed as array
  * HOF compositions (map-side, no UDFs, no driver objects).
  *
  * `fields`: array<struct<tag,ind1,ind2,data,subfields:array<struct<code,value>>>>
  */
object Extract {

  private def sfs(f: Column): Column =
    coalesce(f("subfields"), array().cast("array<struct<code:string,value:string>>"))

  /** Subfield values of `f` whose code is in `codes` ('*' = all), in
    * field order (pymarc Field.get_subfields).
    */
  def subfieldValues(f: Column, codes: String): Column = {
    val matching =
      if (codes == "*") sfs(f)
      else filter(sfs(f), s => s("code").isin(codes.map(_.toString): _*))
    transform(matching, s => s("value"))
  }

  def fieldsWithTag(fields: Column, tags: String*): Column =
    filter(fields, f => f("tag").isin(tags: _*))

  /** First field with `tag` having ≥1 subfield in `codes`, its matching
    * subfields joined — marc/helper.py:12-18 `subfields_as_string`.
    */
  def subfieldsAsString(fields: Column, tag: String, codes: String,
                        joinWith: String = " "): Column = {
    val candidates = transform(fieldsWithTag(fields, tag),
      f => subfieldValues(f, codes))
    val first = get(filter(candidates, a => size(a) > 0), lit(0))
    when(first.isNotNull, array_join(first, joinWith))
  }

  /** Data of the first field with `tag` — extract_fixed_field (:86-90). */
  def fixedField(fields: Column, tag: String): Column =
    get(fieldsWithTag(fields, tag), lit(0))("data")

  // ------------------------------------------------------------ bib fields

  /** 245 abfghknp, punctuation-trimmed — extract_title (:21-22). */
  def title(fields: Column): Column =
    TrimPunctuation(subfieldsAsString(fields, "245", "abfghknp"))

  /** 100/110/111, all fields, subfield $0 excluded — extract_author (:25-30). */
  def author(fields: Column): Column =
    TrimPunctuation(array_join(
      flatten(transform(fieldsWithTag(fields, "100", "110", "111"),
        f => transform(filter(sfs(f), s => s("code") =!= "0"), s => s("value")))),
      " "))

  /** 260c : 264|ind2∈{1,2,' 3'}|c : 260g — extract_publication_date
    * (:33-44), including the reference's literal `' 3'` indicator
    * comparison, capped at 254 chars.
    */
  def publicationDate(fields: Column): Column = {
    val v260c = nonEmptyJoined(fields, "260", "c")
    val v264c = transform(
      filter(fieldsWithTag(fields, "264"),
        f => f("ind2").isin("1", "2", " 3") && size(subfieldValues(f, "c")) > 0),
      f => array_join(subfieldValues(f, "c"), " "))
    val v260g = nonEmptyJoined(fields, "260", "g")
    substring(TrimPunctuation(
      array_join(concat(v260c, v264c, v260g), " ")), 1, 254)
  }

  /** Per-field joined values for fields with ≥1 subfield in `codes`. */
  private def nonEmptyJoined(fields: Column, tag: String, codes: String): Column =
    transform(
      filter(fieldsWithTag(fields, tag), f => size(subfieldValues(f, codes)) > 0),
      f => array_join(subfieldValues(f, codes), " "))

  /** 260bf : 264b — extract_publisher (:47-55). */
  def publisher(fields: Column): Column =
    TrimPunctuation(array_join(
      concat(nonEmptyJoined(fields, "260", "bf"), nonEmptyJoined(fields, "264", "b")),
      " "))

  /** 260ae : 264a : 752abcd — extract_publication_place (:58-69). */
  def publicationPlace(fields: Column): Column =
    TrimPunctuation(array_join(
      concat(nonEmptyJoined(fields, "260", "ae"),
             nonEmptyJoined(fields, "264", "a"),
             nonEmptyJoined(fields, "752", "abcd")),
      " "))

  /** 300 acef — extract_extent (:72-73). */
  def extent(fields: Column): Column = subfieldsAsString(fields, "300", "acef")

  /** 300b + 340* joined, nulls dropped — extract_material (:76-80). */
  def material(fields: Column): Column =
    array_join(
      filter(array(subfieldsAsString(fields, "300", "b"),
                   subfieldsAsString(fields, "340", "*")),
             v => v.isNotNull && length(v) > 0), // python truthiness: '' dropped
      " ")

  /** 852 khimt, trimmed — extract_call_number (:83-84). */
  def callNumber(fields: Column): Column =
    TrimPunctuation(subfieldsAsString(fields, "852", "khimt"))

  /** (library, location) from first 852 with $b and $c —
    * extract_library_and_location_code (:106-113).
    */
  def libraryCode(fields: Column): Column = first852bc(fields)("b")
  def locationCode(fields: Column): Column = first852bc(fields)("c")
  private def first852bc(fields: Column): Column =
    get(
      transform(
        filter(fieldsWithTag(fields, "852"),
          f => size(subfieldValues(f, "b")) > 0 && size(subfieldValues(f, "c")) > 0),
        f => struct(get(subfieldValues(f, "b"), lit(0)).as("b"),
                    get(subfieldValues(f, "c"), lit(0)).as("c"))),
      lit(0))

  // ------------------------------------------------------------ identifiers

  /** $a list of the first `tag` field that has $a and no subfield in
    * `skipCodes` — extract_values (:145-151). Returns null if the first
    * such candidate doesn't exist.
    */
  def extractValues(fields: Column, tag: String, skipCodes: String): Column =
    get(
      transform(
        filter(fieldsWithTag(fields, tag),
          f => size(filter(sfs(f),
                 s => s("code").isin(skipCodes.map(_.toString): _*))) === 0 &&
               size(subfieldValues(f, "a")) > 0),
        f => subfieldValues(f, "a")),
      lit(0))

  /** ALL ISBNs: $a list of the first 020 without $z, with the first
    * ≥13-char value moved to the front — extract_isbns (:116-127).
    */
  def isbns(fields: Column): Column = {
    val vals = extractValues(fields, "020", "z")
    val best = get(filter(vals, v => length(v) >= 13), lit(0))
    val bestPos = array_position(vals, best) // 1-based; 0 if absent
    when(best.isNull, vals)
      .otherwise(concat(array(best),
        filter(vals, (_, i) => i =!= (bestPos - 1).cast("int"))))
  }

  /** Best ISBN — extract_isbns head (store_bib_marc line 164). */
  def isbn(fields: Column): Column = get(isbns(fields), lit(0))

  /** ALL ISSNs: $a of first 022 without $y/$z — extract_issns (:129-130). */
  def issns(fields: Column): Column = extractValues(fields, "022", "yz")

  /** First ISSN — extract_issns head (store_bib_marc line 162). */
  def issn(fields: Column): Column = get(issns(fields), lit(0))

  /** ALL OCLC numbers: every 035/079 field (record order) without $z
    * whose joined $a starts with '(ocolc)' or 'oc' (case-insensitive) —
    * extract_oclcs (:132-142). Empty array when none (the reference's
    * falsy `[]`).
    */
  def oclcs(fields: Column): Column = {
    val candidates = transform(
      filter(fieldsWithTag(fields, "035", "079"),
        f => size(subfieldValues(f, "z")) === 0 &&
             size(subfieldValues(f, "a")) > 0),
      f => array_join(subfieldValues(f, "a"), " "))
    filter(candidates, v =>
      lower(v).startsWith("(ocolc)") || lower(v).startsWith("oc"))
  }

  /** First OCLC — extract_oclcs head (store_bib_marc line 163). */
  def oclcNumber(fields: Column): Column = get(oclcs(fields), lit(0))

  /** Voyager/Sierra id from 035$a — extract_voyager_or_sierra_id
    * (:93-102): `(CtY-L)b…` → strip prefix and last char;
    * `(CtY)…-yaledb-Voyager` → the middle. First $a per field, first
    * match wins.
    */
  def voyagerId(fields: Column): Column = {
    val firstAs = transform(
      filter(fieldsWithTag(fields, "035"), f => size(subfieldValues(f, "a")) > 0),
      f => get(subfieldValues(f, "a"), lit(0)))
    val hit = get(
      filter(firstAs, v =>
        v.startsWith("(CtY-L)b") ||
        (v.startsWith("(CtY)") && v.endsWith("-yaledb-Voyager"))),
      lit(0))
    // '(CtY-L)' = 7 chars, trailing check digit dropped;
    // '(CtY)' = 5 chars, '-yaledb-Voyager' = 15 chars
    when(hit.startsWith("(CtY-L)b"), hit.substr(lit(8), length(hit) - 8))
      .when(hit.isNotNull, hit.substr(lit(6), length(hit) - 20))
  }

  // ------------------------------------------------------------ system fields

  /** suppress: 'Y' unless <tag>$a == 'false' —
    * alma_publish_to_database.py:145,243.
    */
  def suppress(fields: Column, tag: String): Column =
    when(subfieldsAsString(fields, tag, "a") === "false", lit("N")).otherwise(lit("Y"))

  /** (create, update) system dates from <tag>$1/$2 ($2 defaulting to $1)
    * — extract_system_dates (:153-159).
    */
  def systemDates(fields: Column, tag: String): Column =
    get(
      transform(
        filter(fieldsWithTag(fields, tag),
          f => size(subfieldValues(f, "1")) > 0),
        f => struct(
          parseDateStr(get(subfieldValues(f, "1"), lit(0))).as("create"),
          parseDateStr(coalesce(get(subfieldValues(f, "2"), lit(0)),
                                get(subfieldValues(f, "1"), lit(0)))).as("update"))),
      lit(0))

  /** Lenient date parse with 'US/Eastern' → America/New_York —
    * parse_date_str (:161-166). Handles the corpus formats
    * 'yyyy-MM-dd HH:mm:ss[ US/Eastern]'.
    */
  def parseDateStr(c: Column): Column = {
    val cleaned = regexp_replace(c, " US/Eastern$", "")
    val parsed = to_timestamp(cleaned, "yyyy-MM-dd HH:mm:ss")
    when(c.isNull, lit(null).cast("timestamp"))
      .when(c.endsWith(" US/Eastern"), to_utc_timestamp(parsed, "America/New_York"))
      .otherwise(parsed)
  }
}
