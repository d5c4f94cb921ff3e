package graft.model

/** Spark-native MARC data model replacing the reference's pymarc objects
  * (alma_publish_parser.py uses pymarc.Record/Field/Subfield).
  *
  * One record is one row; fields/subfields are nested arrays so all
  * extraction logic runs as Column expressions over the arrays (stays in
  * whole-stage codegen, parallel per record batch, no driver objects).
  *
  * Control fields (tag 00X) carry `data` and an empty `subfields`;
  * data fields carry indicators + subfields and a null `data`.
  */
final case class MarcSubfield(code: String, value: String)

final case class MarcField(
    tag: String,
    ind1: String,
    ind2: String,
    data: String,
    subfields: Seq[MarcSubfield]) {
  def isControl: Boolean = tag.startsWith("00")
  def subfield(code: String): Option[String] =
    subfields.find(_.code == code).map(_.value)
  def subfieldValues(codes: String): Seq[String] =
    subfields.filter(sf => codes.contains(sf.code)).map(_.value)
}

object MarcField {
  def control(tag: String, data: String): MarcField =
    MarcField(tag, null, null, data, Seq.empty)
  def data(tag: String, ind1: String, ind2: String, subfields: Seq[MarcSubfield]): MarcField =
    MarcField(tag, ind1, ind2, null, subfields)
}

final case class MarcRecord(leader: String, fields: Seq[MarcField]) {
  def fieldsWithTag(tags: String*): Seq[MarcField] =
    fields.filter(f => tags.contains(f.tag))
  def controlValue(tag: String): Option[String] =
    fields.find(_.tag == tag).map(_.data)
  def mmsId: Option[String] = controlValue("001")
}

/** Flat "brief" rows mirroring ddl/data_sync_db.sql. */
final case class BibBrief(
    mms_id: String,
    title: String,
    author: String,
    publication_date: String,
    publication_place: String,
    publisher: String,
    field008: String,
    extent: String,
    material: String,
    leader: String,
    issn: String,
    isbn: String,
    oclc_number: String,
    voyager_bib_id: String,
    suppress: String)

final case class HoldingBrief(
    holding_id: String,
    mms_id: String,
    display_call_number: String,
    library_code: String,
    location_code: String,
    field008: String,
    voyager_holding_id: String,
    suppress: String)
