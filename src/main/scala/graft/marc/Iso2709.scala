package graft.marc

import java.nio.charset.StandardCharsets

import graft.model.{MarcField, MarcSubfield}
import graft.marc.PublishSplit.PublishRow

/** ISO 2709 binary MARC codec — the engine's `as_marc` / MARCReader
  * (alma_publish_to_database.py:175-184, alma_publish_parser.py:222).
  *
  * Layout: 24-byte leader (record length at 0-4, base address at
  * 12-16), directory of 12-byte entries (tag, field length, start
  * offset), 0x1E field terminator after the directory and each field,
  * 0x1D record terminator. Subfields prefixed with 0x1F + code;
  * indicators are the first two bytes of a data field.
  */
object Iso2709 {
  final val FieldTerminator: Byte = 0x1e
  final val RecordTerminator: Byte = 0x1d
  final val SubfieldDelimiter: Byte = 0x1f
  /** pymarc's max record length (5-digit length field). */
  final val MaxRecordLength = 99999

  private def fieldBytes(f: MarcField): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    if (f.isControl) {
      sb.write(Option(f.data).getOrElse("").getBytes(StandardCharsets.UTF_8))
    } else {
      sb.write(Option(f.ind1).getOrElse(" ").padTo(1, ' ').take(1).getBytes(StandardCharsets.UTF_8))
      sb.write(Option(f.ind2).getOrElse(" ").padTo(1, ' ').take(1).getBytes(StandardCharsets.UTF_8))
      Option(f.subfields).getOrElse(Seq.empty).foreach { s =>
        sb.write(SubfieldDelimiter)
        sb.write(s.code.getBytes(StandardCharsets.UTF_8))
        sb.write(Option(s.value).getOrElse("").getBytes(StandardCharsets.UTF_8))
      }
    }
    sb.write(FieldTerminator)
    sb.toByteArray
  }

  private def num(n: Int, width: Int): Array[Byte] = {
    val s = n.toString
    ("0" * (width - s.length) + s).getBytes(StandardCharsets.US_ASCII)
  }

  /** Serialize one record. The 24-char leader gets its length/base
    * fields recomputed (as pymarc does on as_marc). The leader is
    * 24 ASCII POSITIONS by the MARC spec — non-ASCII characters would
    * shift every byte offset after it, so they are replaced with ' '.
    */
  def encode(leader: String, fields: Seq[MarcField]): Array[Byte] = {
    val ldr = (Option(leader).getOrElse("") + (" " * 24)).take(24)
      .map(c => if (c < 0x20 || c > 0x7e) ' ' else c).toCharArray
    val dir = new java.io.ByteArrayOutputStream()
    val data = new java.io.ByteArrayOutputStream()
    fields.foreach { f =>
      val b = fieldBytes(f)
      dir.write(f.tag.getBytes(StandardCharsets.US_ASCII))
      dir.write(num(b.length, 4))
      dir.write(num(data.size(), 5))
      data.write(b)
    }
    dir.write(FieldTerminator)
    val base = 24 + dir.size()
    val total = base + data.size() + 1
    System.arraycopy(num(total, 5).map(_.toChar), 0, ldr, 0, 5)
    System.arraycopy(num(base, 5).map(_.toChar), 0, ldr, 12, 5)
    val out = new java.io.ByteArrayOutputStream()
    out.write(new String(ldr).getBytes(StandardCharsets.UTF_8))
    out.write(dir.toByteArray)
    out.write(data.toByteArray)
    out.write(RecordTerminator)
    out.toByteArray
  }

  /** Encode with the reference's size-cap fallback: if over 99999
    * bytes, drop `dropTag` fields and retry; None if still too big
    * (alma_publish_to_database.py:175-184).
    *
    * Note a reference divergence, deliberately: line 178 reads
    * `params['raw_marc'] == record.as_marc()` — a comparison where an
    * assignment was intended — so the reference's BIB-drop retry can
    * never actually succeed for bib records (the unchanged original
    * bytes are re-checked and the record is skipped). The holding path
    * (line 258) assigns correctly. This engine implements the evident
    * intent for both.
    */
  def encodeCapped(leader: String, fields: Seq[MarcField],
                   dropTag: String): Option[Array[Byte]] = {
    val first = encode(leader, fields)
    if (first.length <= MaxRecordLength) Some(first)
    else {
      val retry = encode(leader, fields.filterNot(_.tag == dropTag))
      if (retry.length <= MaxRecordLength) Some(retry) else None
    }
  }

  /** Decode one record starting at `offset`; returns (record, next offset). */
  def decodeOne(bytes: Array[Byte], offset: Int): (PublishRow, Int) = {
    val lenStr = new String(bytes, offset, 5, StandardCharsets.US_ASCII)
    val total = lenStr.toInt
    val leader = new String(bytes, offset, 24, StandardCharsets.UTF_8)
    val base = new String(bytes, offset + 12, 5, StandardCharsets.US_ASCII).toInt
    val fields = Seq.newBuilder[MarcField]
    var d = offset + 24
    while (bytes(d) != FieldTerminator) {
      val tag = new String(bytes, d, 3, StandardCharsets.US_ASCII)
      val flen = new String(bytes, d + 3, 4, StandardCharsets.US_ASCII).toInt
      val fstart = new String(bytes, d + 7, 5, StandardCharsets.US_ASCII).toInt
      val s = offset + base + fstart
      val body = bytes.slice(s, s + flen - 1) // strip field terminator
      if (tag.startsWith("00")) {
        fields += MarcField.control(tag, new String(body, StandardCharsets.UTF_8))
      } else {
        val ind1 = new String(body, 0, 1, StandardCharsets.UTF_8)
        val ind2 = new String(body, 1, 1, StandardCharsets.UTF_8)
        val subs = Seq.newBuilder[MarcSubfield]
        var i = 2
        while (i < body.length) {
          if (body(i) == SubfieldDelimiter) {
            val code = new String(body, i + 1, 1, StandardCharsets.UTF_8)
            var j = i + 2
            while (j < body.length && body(j) != SubfieldDelimiter) j += 1
            subs += MarcSubfield(code,
              new String(body, i + 2, j - i - 2, StandardCharsets.UTF_8))
            i = j
          } else i += 1
        }
        fields += MarcField.data(tag, ind1, ind2, subs.result())
      }
      d += 12
    }
    val fs = fields.result()
    val mms = fs.find(_.tag == "001").map(_.data).orNull
    (PublishRow(mms, leader, fs), offset + total)
  }

  /** Decode a concatenated stream of records (a binary publish file).
    *
    * Malformed/truncated chunks are SKIPPED, not thrown: the
    * reference's MARCReader yields None for a bad chunk, logs, and
    * continues (and a thrown exception here would fail the whole Spark
    * task and poison the file's batch). Recovery scans forward to the
    * next record terminator; if the bad chunk's declared length is
    * unparsable, the rest of the stream after the terminator is
    * re-attempted.
    */
  def decodeAll(bytes: Array[Byte]): Seq[PublishRow] = {
    val out = Seq.newBuilder[PublishRow]
    var off = 0
    while (off < bytes.length && bytes.length - off > 5) {
      try {
        val (rec, next) = decodeOne(bytes, off)
        if (next <= off) throw new IllegalStateException("no progress")
        out += rec
        off = next
      } catch {
        case scala.util.control.NonFatal(_) =>
          // skip to just past the next record terminator (0x1D)
          var k = off
          while (k < bytes.length && bytes(k) != RecordTerminator) k += 1
          off = k + 1
      }
    }
    out.result()
  }
}
