package graft.marc

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.model.{MarcField, MarcSubfield}

/** Alma publish-record splitter: one publish record → one bib MARC
  * record + N holding MARC records + M item JSONs.
  *
  * Clean-room re-expression of alma_publish_parser.py:60-195:
  *  - 001 moved to first field (line 94-99)
  *  - control-field groups walked off the bib, delimited by 009 pairs,
  *    with 002→007 / 003→008 / 009→leader+id mapping (lines 60-89,
  *    116-148)
  *  - holding-id detection: subfield $8 (items: $0) with prefix '22'
  *    and an institution suffix (lines 18-19, 191-195)
  *  - field routing by $8 into the holding record, $8 dropped
  *    (lines 154-162); ITM fields additionally produce item JSON from
  *    the template (lines 163-171, 251-275)
  *  - first-record-wins per mms_id / holding id is NOT done here — it
  *    is a distributed dedup ([[graft.operators.Relational.firstPerKey]])
  *    because a global mutable `set()` does not exist on a cluster.
  *
  * Spark-first shape: a typed per-row flatMap (Dataset encoder,
  * embarrassingly parallel, no driver state); everything downstream of
  * the split is Column-level.
  */
object PublishSplit {

  val InstitutionIds: Seq[String] =
    Seq("8651", "0521", "0541", "1021", "0951", "0121")
  val HoldingPrefix = "22"

  case class PublishRow(mms_id: String, leader: String, fields: Seq[MarcField])

  /** One output row per bib/holding/item (kind ∈ bib|holding|item|error). */
  case class SplitOut(
      kind: String,
      mms_id: String,
      holding_id: String,
      pid: String,
      leader: String,
      fields: Seq[MarcField],
      item_json: String,
      item_pids: Seq[String],
      error: String)

  def holdingIdSubfield(f: MarcField, code: String = "8"): Option[MarcSubfield] =
    Option(f.subfields).getOrElse(Seq.empty).find(s =>
      s.code == code && s.value != null &&
      s.value.startsWith(HoldingPrefix) &&
      InstitutionIds.exists(s.value.endsWith))

  /** Control-field groups in holding order (each delimited by 009s);
    * returns (groups, remaining bib fields). Mirrors
    * extract_control_field_groups semantics exactly, immutably.
    */
  def extractControlFieldGroups(fields: Seq[MarcField])
      : (Seq[Seq[MarcField]], Seq[MarcField]) = {
    val groups = Seq.newBuilder[Seq[MarcField]]
    var current = Seq.newBuilder[MarcField]
    val holdingControl = collection.mutable.Set.empty[Int]
    var inHolding = false
    var tag005Cnt = 0
    var broke = false
    fields.zipWithIndex.foreach { case (f, ix) =>
      if (!broke) {
        if (!f.tag.startsWith("00")) broke = true
        else {
          var exitHolding = false
          if (f.tag == "009" && inHolding) exitHolding = true
          if (f.tag == "005") {
            tag005Cnt += 1
            if (tag005Cnt > 1) inHolding = true
          }
          if (f.tag == "009" || f.tag == "003" || f.tag == "002") inHolding = true
          if (inHolding) {
            current += f
            holdingControl += ix
          }
          if (exitHolding) {
            groups += current.result()
            current = Seq.newBuilder[MarcField]
            inHolding = false
          }
        }
      }
    }
    val remaining = fields.zipWithIndex.collect {
      case (f, ix) if !holdingControl.contains(ix) => f
    }
    (groups.result(), remaining)
  }

  private def dropSubfield(f: MarcField, sub: MarcSubfield): MarcField = {
    // remove the FIRST matching subfield only (list.remove semantics)
    val ix = f.subfields.indexOf(sub)
    f.copy(subfields = f.subfields.patch(ix, Nil, 1))
  }

  def splitRecord(row: PublishRow, itemTemplate: String): Seq[SplitOut] = {
    try {
      val fld001 = row.fields.find(_.tag == "001")
        .getOrElse(throw new IllegalArgumentException("no 001"))
      val mmsId = fld001.data
      // move 001 first
      val reordered = fld001 +: row.fields.filterNot(_ eq fld001)

      val (groups, afterGroups) = extractControlFieldGroups(reordered)

      val flds852 = afterGroups.filter(f => f.tag == "852" &&
        holdingIdSubfield(f).isDefined)
      val bibsHoldingIds = flds852.flatMap(f => holdingIdSubfield(f).map(_.value)).distinct
      if (bibsHoldingIds.size != groups.size)
        throw new IllegalStateException(
          s"Holding Count does not match control field groups: $mmsId")

      // synthesize one holding record per distinct $8 in 852 order
      var holdingIndex = 0
      val holdingRecords = collection.mutable.LinkedHashMap.empty[String, (String, Seq[MarcField])]
      flds852.foreach { f =>
        val hid = holdingIdSubfield(f).get.value
        if (!holdingRecords.contains(hid)) {
          val g = groups(holdingIndex)
          holdingIndex += 1
          val leadersAndIds = g.filter(_.tag == "009")
          val h005s = g.filter(_.tag == "005")
          val h007s = g.filter(_.tag == "002")
          val h008s = g.filter(_.tag == "003")
          val (orig001, leader) = leadersAndIds match {
            case Seq(only) => (None, only.data)
            case Seq(a, b) =>
              def isDigits(s: String) = s != null && s.nonEmpty && s.forall(_.isDigit)
              if (isDigits(b.data) && !isDigits(a.data))
                throw new IllegalStateException(
                  s"Leader and fld001 look problematic: $mmsId / $hid")
              (Some(a.data), b.data)
            case _ => throw new IllegalStateException(
              s"Holding leader and id is not 2 for mmsid: $mmsId / $hid")
          }
          val syn035 = orig001.toSeq.flatMap { v =>
            if (v.startsWith(HoldingPrefix) && InstitutionIds.exists(v.endsWith))
              Seq.empty
            else {
              val voyager =
                if (v.nonEmpty && v.forall(_.isDigit) && v.length < 9)
                  Seq(MarcField.data("035", " ", " ",
                    Seq(MarcSubfield("a", s"(CtY)$v-yaledb-Voyager"))))
                else Seq.empty
              val other =
                if (v.contains("yale_inst"))
                  Seq(MarcField.data("035", " ", " ",
                    Seq(MarcSubfield("a",
                      s"(CtY)${v.replace("yale_inst", "")}-yaledb-Other"))))
                else Seq.empty
              voyager ++ other
            }
          }
          val base =
            Seq(MarcField.control("001", hid), MarcField.control("004", mmsId)) ++
            syn035 ++
            h005s.headOption.toSeq ++
            h007s.map(f7 => MarcField.control("007", f7.data)) ++
            h008s.map(f8 => MarcField.control("008", f8.data))
          holdingRecords(hid) = (leader, base)
        }
      }

      // route datafields by $8; collect items
      val bibFields = Seq.newBuilder[MarcField]
      val itemJsons = Seq.newBuilder[(String, String, String)] // (pid, hid, json)
      val itemsByHolding = collection.mutable.Map.empty[String, Seq[String]]
      afterGroups.foreach { f =>
        if (f.isControl) bibFields += f
        else {
          val routed = holdingIdSubfield(f) match {
            case Some(sub) =>
              val hid = sub.value
              val stripped = dropSubfield(f, sub)
              holdingRecords.get(hid).foreach { case (l, fs) =>
                holdingRecords(hid) = (l, fs :+ stripped)
              }
              Some(stripped)
            case None => None
          }
          val fieldForItem = routed.getOrElse(f)
          val isItem = f.tag == "ITM" &&
            holdingIdSubfield(fieldForItem, "0").isDefined
          if (isItem) {
            val hid0 = fieldForItem.subfield("0").get
            val pid = fieldForItem.subfield("2").orNull
            itemsByHolding(hid0) = itemsByHolding.getOrElse(hid0, Seq.empty) :+ pid
            itemJsons += ((pid, hid0,
              ItemTemplate.fill(itemTemplate, mmsId, fieldForItem)))
          }
          // a field stays on the bib only if it was neither routed by $8
          // nor consumed as an item (parser lines 160, 170: an ITM
          // without $0 and without $8 is left in place)
          if (routed.isEmpty && !isItem) bibFields += f
        }
      }

      val bib = SplitOut("bib", mmsId, null, null, row.leader,
        bibFields.result(), null, bibsHoldingIds, null)
      val holdings = holdingRecords.toSeq.map { case (hid, (leader, fs)) =>
        SplitOut("holding", mmsId, hid, null, leader, fs, null,
          itemsByHolding.getOrElse(hid, Seq.empty), null)
      }
      val items = itemJsons.result().map { case (pid, hid, json) =>
        SplitOut("item", mmsId, hid, pid, null, null, json, null, null)
      }
      (bib +: holdings) ++ items
    } catch {
      case e: Exception =>
        Seq(SplitOut("error", row.mms_id, null, null, null, null, null, null,
          e.getMessage))
    }
  }

  /** Distributed split: publish corpus DataFrame → tagged union of
    * bib/holding/item rows. Parse-parallel per record; the downstream
    * first-record-wins dedup is a separate relational op.
    */
  def split(publish: DataFrame): Dataset[SplitOut] = {
    val spark = publish.sparkSession
    import spark.implicits._
    val template = ItemTemplate.Template
    publish.select("mms_id", "leader", "fields").as[PublishRow]
      .flatMap(r => splitRecord(r, template))
  }

  /** Split carrying a caller-supplied `ordinal` column through to every
    * output row — the record's position in sorted-file order
    * (source path + in-file index). Downstream first/last-record-wins
    * dedup orders on it, reproducing the reference's sequential
    * `bib_ids`/`holding_ids` sets deterministically on a cluster.
    */
  def splitOrdered(publish: DataFrame): DataFrame = {
    val spark = publish.sparkSession
    import spark.implicits._
    val template = ItemTemplate.Template
    publish
      .select(org.apache.spark.sql.functions.col("ordinal"),
        org.apache.spark.sql.functions.struct("mms_id", "leader", "fields").as("r"))
      .as[(String, PublishRow)]
      .flatMap { case (ord, r) => splitRecord(r, template).map(o => (ord, o)) }
      .toDF("ordinal", "o")
      .select("o.*", "ordinal")
  }
}
