package graft.marc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{MarcField, MarcSubfield}
import graft.marc.PublishSplit.PublishRow
import graft.sources.Tables

/** Deterministic Alma-publish MARC corpus generated from the TPC-H
  * tables (the driver's only inputs — TESTDATA.md).
  *
  * One publish record per order, one holding per lineitem, one item per
  * lineitem — mirroring the Alma publish shape the reference parses
  * (alma_publish_parser.py:91-189): control-field groups delimited by
  * 009 pairs, holding fields routed by the $8 holding-id subfield
  * (prefix '22', institution suffix '8651' —
  * alma_publish_parser.py:18-19,191-195), ITM item fields, BIB/HLD
  * system fields carrying suppress + system dates.
  *
  * Shape: scans, joins, date formatting and ordering are declarative
  * (Catalyst prunes/pushes/broadcasts); the per-record field-array
  * assembly is a typed map — a ~40-field nested struct literal per
  * record blows past codegen method limits as a Column expression and
  * falls back to interpreted eval, while plain object construction
  * under an Encoder stays fast and is equally distributed.
  *
  * Content derives from table columns so the driver's DuckDB oracle
  * recomputes every downstream extraction INDEPENDENTLY of the MARC
  * path (build→split→extract == direct SQL).
  */
object MarcCorpus {

  val InstitutionSuffix = "8651"
  val HoldingPrefix = "22"
  val BibPrefix = "99"

  // ------------------------------------------------------------ id columns

  def mmsId(orderkey: Column): Column =
    concat(lit(BibPrefix), orderkey.cast("string"), lit(InstitutionSuffix))

  def holdingId(orderkey: Column, linenumber: Column): Column =
    concat(lit(HoldingPrefix), (orderkey * 100 + linenumber).cast("string"),
           lit(InstitutionSuffix))

  def itemPid(orderkey: Column, linenumber: Column): Column =
    concat(lit("23"), (orderkey * 100 + linenumber).cast("string"),
           lit(InstitutionSuffix))

  /** Voyager-style short numeric holding id (digits, <9 chars) — makes
    * the splitter synthesize the 035 `(CtY)…-yaledb-Voyager` field
    * (alma_publish_parser.py:137-140).
    */
  def voyagerHoldingId(orderkey: Column, linenumber: Column): Column =
    pmod(orderkey * 100 + linenumber, lit(10000000L)).cast("string")

  private def ts(d: Column): Column = date_format(d, "yyyy-MM-dd HH:mm:ss")

  // ------------------------------------------------------- typed assembly

  case class HoldingInput(
      ln: Long, holding_id: String, pid: String, voyager_id: String,
      library_code: String, location_code: String, class_part: String,
      cutter: String, ship_ts: String, ts005: String, h008: String,
      l_returnflag: String, l_linestatus: String, qty: Long)

  case class CorpusInput(
      o_orderkey: Long, o_custkey: Long, o_orderpriority: String,
      c_name: String, c_mktsegment: String, cust_nation: String,
      od_ts: String, od_yymmdd: String, od_year: String, od_005: String,
      hs: Seq[HoldingInput])

  private def ctl(tag: String, data: String) = MarcField.control(tag, data)
  private def fld(tag: String, i1: String, i2: String, subs: (String, String)*) =
    MarcField.data(tag, i1, i2, subs.map { case (c, v) => MarcSubfield(c, v) })

  /** Spark-`lpad` semantics (pad left; truncate to prefix if longer). */
  private def lpad5(n: Long, len: Int): String = {
    val s = n.toString
    if (s.length >= len) s.substring(0, len)
    else ("0" * (len - s.length)) + s
  }

  /** One publish record from its narrow input row. */
  def assemble(r: CorpusInput): PublishRow = {
    val k = r.o_orderkey
    val ck = r.o_custkey
    val mms = s"$BibPrefix$k$InstitutionSuffix"
    val fields = Seq.newBuilder[MarcField]

    // 001 deliberately NOT first (Alma quirk the splitter must fix —
    // alma_publish_parser.py:94-99)
    fields += ctl("008", s"${r.od_yymmdd}s${r.od_year}    xxu           000 0 eng d")
    fields += ctl("001", mms)
    fields += ctl("005", r.od_005)

    // control-field groups: [009 voyager-id, 005, 002, 003, 009 leader]
    // per holding (alma_publish_parser.py:60-89 walks these off the bib)
    r.hs.foreach { h =>
      fields += ctl("009", h.voyager_id)
      fields += ctl("005", h.ts005)
      fields += ctl("002", "ta")
      fields += ctl("003", h.h008)
      fields += ctl("009", "00000nx  a2200000zn 4500")
    }

    fields += fld("245", "1", "0",
      "a" -> s"Order $k",
      "b" -> s"${r.c_mktsegment} annals ;",
      "c" -> "excluded statement", // 'c' not in abfghknp
      "n" -> s"no. ${k % 7}")
    fields += fld("100", "1", " ",
      "a" -> r.c_name,
      "0" -> "authority-id-excluded",
      "d" -> s"b. 19${ck % 100}")
    fields += fld("020", " ", " ",
      "a" -> s"978-0-${lpad5(ck, 5)}-${k % 10}")
    // a cancelled-isbn field (has $z) — extract_isbns must skip it
    fields += fld("020", " ", " ", "z" -> s"0-$k")
    fields += fld("022", " ", " ",
      "a" -> s"${lpad5(k % 10000, 4)}-${lpad5(ck % 10000, 4)}")
    fields += fld("035", " ", " ", "a" -> s"(OCoLC)${k + 1000000}")
    fields += fld("035", " ", " ", "a" -> s"(CtY)$k-yaledb-Voyager")
    fields += fld("260", " ", " ",
      "a" -> s"${r.cust_nation} :",
      "b" -> s"Publisher $ck,",
      "c" -> s"${r.od_year}.")
    fields += fld("264", " ", "1",
      "a" -> s"${r.c_mktsegment} City",
      "b" -> "Distributor & Co.",
      "c" -> s"[${r.od_year}]")
    fields += fld("300", " ", " ",
      "a" -> s"xii, ${k % 900} p.",
      "b" -> "ill. ;",
      "c" -> "24 cm.")
    fields += fld("340", " ", " ", "a" -> r.o_orderpriority)
    fields += fld("752", " ", " ",
      "a" -> "United States",
      "d" -> s"${r.c_mktsegment} County")
    fields += fld("BIB", " ", " ",
      "a" -> (if (k % 3 == 0) "false" else "true"),
      "1" -> s"${r.od_ts} US/Eastern",
      "2" -> r.od_ts)
    if (k % 5 == 0)
      fields += fld("774", "0", " ",
        "w" -> s"$BibPrefix${k + 1}$InstitutionSuffix")

    r.hs.foreach { h =>
      fields += fld("852", "0", " ",
        "b" -> h.library_code, "c" -> h.location_code,
        "h" -> h.class_part, "i" -> h.cutter, "8" -> h.holding_id)
    }
    r.hs.foreach { h =>
      fields += fld("HLD", " ", " ",
        "8" -> h.holding_id,
        "a" -> (if (h.ln % 2 == 0) "false" else "true"),
        "1" -> h.ship_ts, "2" -> h.ship_ts)
    }
    // ITM: $8 routes a copy into the holding record; $0/$2 drive the
    // item JSON (alma_publish_parser.py:157-171). Temp location differs
    // from perm iff returnflag = 'R' → in_temp_location true.
    r.hs.foreach { h =>
      fields += fld("ITM", " ", " ",
        "8" -> h.holding_id,
        "0" -> h.holding_id,
        "2" -> h.pid,
        "1" -> s"39002${h.pid}",
        "4" -> "book",
        "h" -> h.library_code,
        "s" -> h.location_code,
        "i" -> (if (h.l_returnflag == "R") "TEMPLIB" else h.library_code),
        "t" -> (if (h.l_returnflag == "R") "TEMPLOC" else h.location_code),
        "x" -> (if (h.l_linestatus == "F") "1" else "0"),
        "g" -> s"copy  ${h.qty}   desc",
        "e" -> s"v.${h.ln}",
        "f" -> s"Jan ${h.qty}",
        "w" -> h.ship_ts,
        "r" -> h.ship_ts,
        "z" -> h.ship_ts,
        "3" -> h.qty.toString,
        "b" -> (h.ln % 3).toString)
    }

    PublishRow(mms, "00000cam a2200000 a 4500", fields.result())
  }

  /** The narrow declarative stage: joins + date formats + per-order
    * holding arrays (pushdown/pruning/broadcasts all visible to
    * Catalyst).
    */
  def corpusInputs(t: Tables): Dataset[CorpusInput] = {
    import org.apache.spark.sql.expressions.Window
    // one holding per (order, linenumber): the synthetic lineitem table
    // carries duplicate line numbers, and a publish record has exactly
    // one control-field group per DISTINCT holding id — first row wins,
    // deterministically (mirrors the reference's holding_ids set,
    // alma_publish_parser.py:115,172-183)
    val w = Window.partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
               col("l_extendedprice"))
    // NOT fanned out (r11, measured twice in the full-bench context):
    // a 32-way rebalance here let the fused assemble+split+persist run
    // fully parallel and DID win in isolation (39s → 10s), but under a
    // loaded bench session the 32 concurrent object-building tasks
    // quadrupled the split materialization (9s → 35s, allocation/GC
    // contention with the session's live caches). The window's own
    // (l_orderkey, l_linenumber) exchange keeps the corpus build at
    // the scan's natural parallelism — which at production scale is
    // full parallelism anyway.
    val lineitems = t.lineitem
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val li = lineitems
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"),
                                      col("n_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("l_orderkey"), col("l_linenumber").as("ln"),
        holdingId(col("l_orderkey"), col("l_linenumber")).as("holding_id"),
        itemPid(col("l_orderkey"), col("l_linenumber")).as("pid"),
        voyagerHoldingId(col("l_orderkey"), col("l_linenumber")).as("voyager_id"),
        col("r_name").as("library_code"),
        col("n_name").as("location_code"),
        concat(lit("QA"), col("l_partkey").cast("string")).as("class_part"),
        concat(lit(".B"), col("l_suppkey").cast("string")).as("cutter"),
        ts(col("l_shipdate")).as("ship_ts"),
        date_format(col("l_shipdate"), "yyyyMMddHHmmss.0").as("ts005"),
        concat(date_format(col("l_shipdate"), "yyMMdd"),
               lit("0u    8   4001uu   0901128")).as("h008"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"))

    val holdings = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("ln"), col("holding_id"), col("pid"), col("voyager_id"),
        col("library_code"), col("location_code"), col("class_part"),
        col("cutter"), col("ship_ts"), col("ts005"), col("h008"),
        col("l_returnflag"), col("l_linestatus"), col("qty")))).as("hs"))

    val o = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey").as("cn_key"),
                                      col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cn_key"))
      .join(holdings, col("o_orderkey") === col("l_orderkey")) // inner: orders w/ lineitems
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
              col("c_name"), col("c_mktsegment"), col("cust_nation"),
              ts(col("o_orderdate")).as("od_ts"),
              date_format(col("o_orderdate"), "yyMMdd").as("od_yymmdd"),
              year(col("o_orderdate")).cast("string").as("od_year"),
              date_format(col("o_orderdate"), "yyyyMMddHHmmss.0").as("od_005"),
              col("hs"))
    val spark = t.spark
    import spark.implicits._
    o.as[CorpusInput]
  }

  /** The publish-record corpus: (mms_id, leader, fields array). */
  def publishRecords(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    corpusInputs(t).map(assemble).toDF()
  }

  /** Fused corpus-build → split: one typed chain (narrow input →
    * assemble → splitRecord) with NO materialization of the deep-nested
    * publish records in between. Catalyst's `EliminateSerialization`
    * removes the serialize/deserialize pair between the adjacent typed
    * ops, so each record goes input-row → objects → split rows in one
    * pass — the nested `Seq[MarcField]` never round-trips through a
    * cache. At scale this is the difference between caching N deep
    * records twice and caching only the split output once.
    */
  def splitRecords(t: Tables): Dataset[PublishSplit.SplitOut] = {
    val spark = t.spark
    import spark.implicits._
    val template = ItemTemplate.Template
    corpusInputs(t).map(assemble)
      .flatMap(r => PublishSplit.splitRecord(r, template))
  }
}
