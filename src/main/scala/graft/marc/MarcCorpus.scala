package graft.marc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Everything is a Column expression over a single orders⋈customer⋈
  * nation⋈region scan plus one grouped lineitem⋈part⋈supplier scan —
  * map-side generation, one shuffle (the per-order lineitem groupBy).
  *
  * Content is derived from table columns so the driver's DuckDB oracle
  * can recompute every downstream extraction INDEPENDENTLY of the MARC
  * path (build→split→extract == direct SQL).
  */
object MarcCorpus {

  val InstitutionSuffix = "8651"
  val HoldingPrefix = "22"
  val BibPrefix = "99"

  // ---------------------------------------------------------------- helpers

  private val SubfieldsType = "array<struct<code:string,value:string>>"

  /** Control field struct (00X: data, no indicators/subfields). */
  private def ctl(tag: String, data: Column): Column =
    struct(lit(tag).as("tag"),
           lit(null).cast("string").as("ind1"),
           lit(null).cast("string").as("ind2"),
           data.cast("string").as("data"),
           lit(null).cast(SubfieldsType).as("subfields"))

  /** Data field struct. */
  private def fld(tag: String, ind1: String, ind2: String, sfs: Column*): Column =
    struct(lit(tag).as("tag"),
           lit(ind1).as("ind1"),
           lit(ind2).as("ind2"),
           lit(null).cast("string").as("data"),
           array(sfs: _*).cast(SubfieldsType).as("subfields"))

  private def sf(code: String, v: Column): Column =
    struct(lit(code).as("code"), v.cast("string").as("value"))

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

  // ---------------------------------------------------------------- corpus

  /** The publish-record corpus: (mms_id, leader, fields array). */
  def publishRecords(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one holding per (order, linenumber): the synthetic lineitem table
    // carries duplicate line numbers, and a publish record has exactly
    // one control-field group per DISTINCT holding id — first row wins,
    // deterministically (mirrors the reference's holding_ids set,
    // alma_publish_parser.py:115,172-183)
    val w = Window.partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
               col("l_extendedprice"))
    val lineitems = t.lineitem
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // per-lineitem holding/item source rows, ordered within each order
    val li = lineitems
      .join(broadcast(t.part.select(col("p_partkey"), col("p_name"))),
            col("l_partkey") === col("p_partkey"))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"),
                                      col("n_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        holdingId(col("l_orderkey"), col("l_linenumber")).as("holding_id"),
        itemPid(col("l_orderkey"), col("l_linenumber")).as("pid"),
        voyagerHoldingId(col("l_orderkey"), col("l_linenumber")).as("voyager_id"),
        col("r_name").as("library_code"),
        col("n_name").as("location_code"),
        concat(lit("QA"), col("l_partkey").cast("string")).as("class_part"),
        concat(lit(".B"), col("l_suppkey").cast("string")).as("cutter"),
        col("p_name"),
        ts(col("l_shipdate")).as("ship_ts"),
        date_format(col("l_shipdate"), "yyyyMMddHHmmss.0").as("ts005"),
        concat(date_format(col("l_shipdate"), "yyMMdd"),
               lit("0u    8   4001uu   0901128")).as("h008"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"))

    val holdings = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").as("ln"), col("holding_id"), col("pid"),
        col("voyager_id"), col("library_code"), col("location_code"),
        col("class_part"), col("cutter"), col("p_name"), col("ship_ts"),
        col("ts005"), col("h008"), col("l_returnflag"), col("l_linestatus"),
        col("qty")))).as("hs"))

    val o = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey").as("cn_key"),
                                      col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cn_key"))
      .join(holdings, col("o_orderkey") === col("l_orderkey")) // inner: orders w/ lineitems
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_orderpriority"), col("o_orderdate"), col("c_name"),
              col("c_mktsegment"), col("cust_nation"), col("hs"))

    // control-field groups: [009 voyager-id, 005, 002, 003, 009 leader]
    // per holding (alma_publish_parser.py:60-89 walks these off the bib)
    val holdingControlGroups = flatten(transform(col("hs"), h => array(
      ctl("009", h("voyager_id")),
      ctl("005", h("ts005")),
      ctl("002", lit("ta")),
      ctl("003", h("h008")),
      ctl("009", lit("00000nx  a2200000zn 4500")))))

    val bib020 = fld("020", " ", " ",
      sf("a", concat(lit("978-0-"), lpad(col("o_custkey").cast("string"), 5, "0"),
                     lit("-"), pmod(col("o_orderkey"), lit(10)).cast("string"))))
    // a cancelled-isbn field (has $z) — extract_isbns must skip it
    val bib020z = fld("020", " ", " ",
      sf("z", concat(lit("0-"), col("o_orderkey").cast("string"))))
    val bib022 = fld("022", " ", " ",
      sf("a", concat(lpad(pmod(col("o_orderkey"), lit(10000)).cast("string"), 4, "0"),
                     lit("-"),
                     lpad(pmod(col("o_custkey"), lit(10000)).cast("string"), 4, "0"))))
    val oclc035 = fld("035", " ", " ",
      sf("a", concat(lit("(OCoLC)"), (col("o_orderkey") + 1000000).cast("string"))))
    val voyager035 = fld("035", " ", " ",
      sf("a", concat(lit("(CtY)"), col("o_orderkey").cast("string"),
                     lit("-yaledb-Voyager"))))

    val bibDataFields = array(
      fld("245", "1", "0",
        sf("a", concat(lit("Order "), col("o_orderkey").cast("string"))),
        sf("b", concat(col("c_mktsegment"), lit(" annals ;"))),
        sf("c", lit("excluded statement")), // 'c' not in abfghknp
        sf("n", concat(lit("no. "), pmod(col("o_orderkey"), lit(7)).cast("string")))),
      fld("100", "1", " ",
        sf("a", col("c_name")),
        sf("0", lit("authority-id-excluded")),
        sf("d", concat(lit("b. 19"), pmod(col("o_custkey"), lit(100)).cast("string")))),
      bib020, bib020z, bib022, oclc035, voyager035,
      fld("260", " ", " ",
        sf("a", concat(col("cust_nation"), lit(" :"))),
        sf("b", concat(lit("Publisher "), col("o_custkey").cast("string"), lit(","))),
        sf("c", concat(year(col("o_orderdate")).cast("string"), lit(".")))),
      fld("264", " ", "1",
        sf("a", concat(col("c_mktsegment"), lit(" City"))),
        sf("b", lit("Distributor & Co.")),
        sf("c", concat(lit("["), year(col("o_orderdate")).cast("string"), lit("]")))),
      fld("300", " ", " ",
        sf("a", concat(lit("xii, "), pmod(col("o_orderkey"), lit(900)).cast("string"),
                       lit(" p."))),
        sf("b", lit("ill. ;")),
        sf("c", lit("24 cm."))),
      fld("340", " ", " ", sf("a", col("o_orderpriority"))),
      fld("752", " ", " ",
        sf("a", lit("United States")),
        sf("d", concat(col("c_mktsegment"), lit(" County")))),
      fld("BIB", " ", " ",
        sf("a", when(col("o_orderkey") % 3 === 0, lit("false")).otherwise(lit("true"))),
        sf("1", concat(ts(col("o_orderdate")), lit(" US/Eastern"))),
        sf("2", ts(col("o_orderdate")))))

    val bib774 = when(col("o_orderkey") % 5 === 0,
      array(fld("774", "0", " ",
        sf("w", concat(lit(BibPrefix), (col("o_orderkey") + 1).cast("string"),
                       lit(InstitutionSuffix))))))
      .otherwise(array().cast(s"array<struct<tag:string,ind1:string,ind2:string,data:string,subfields:$SubfieldsType>>"))

    val holding852s = transform(col("hs"), h =>
      struct(lit("852").as("tag"), lit("0").as("ind1"), lit(" ").as("ind2"),
        lit(null).cast("string").as("data"),
        array(
          struct(lit("b").as("code"), h("library_code").cast("string").as("value")),
          struct(lit("c").as("code"), h("location_code").cast("string").as("value")),
          struct(lit("h").as("code"), h("class_part").cast("string").as("value")),
          struct(lit("i").as("code"), h("cutter").cast("string").as("value")),
          struct(lit("8").as("code"), h("holding_id").cast("string").as("value"))
        ).cast(SubfieldsType).as("subfields")))

    val holdingHLDs = transform(col("hs"), h =>
      struct(lit("HLD").as("tag"), lit(" ").as("ind1"), lit(" ").as("ind2"),
        lit(null).cast("string").as("data"),
        array(
          struct(lit("8").as("code"), h("holding_id").cast("string").as("value")),
          struct(lit("a").as("code"),
                 when(h("ln") % 2 === 0, lit("false")).otherwise(lit("true"))
                   .cast("string").as("value")),
          struct(lit("1").as("code"), h("ship_ts").cast("string").as("value")),
          struct(lit("2").as("code"), h("ship_ts").cast("string").as("value"))
        ).cast(SubfieldsType).as("subfields")))

    // ITM: $8 routes a copy into the holding record; $0/$2 drive the
    // item JSON (alma_publish_parser.py:157-171). Temp location differs
    // from perm iff returnflag = 'R' → in_temp_location true.
    val itemITMs = transform(col("hs"), h =>
      struct(lit("ITM").as("tag"), lit(" ").as("ind1"), lit(" ").as("ind2"),
        lit(null).cast("string").as("data"),
        array(
          struct(lit("8").as("code"), h("holding_id").cast("string").as("value")),
          struct(lit("0").as("code"), h("holding_id").cast("string").as("value")),
          struct(lit("2").as("code"), h("pid").cast("string").as("value")),
          struct(lit("1").as("code"),
                 concat(lit("39002"), h("pid")).cast("string").as("value")),
          struct(lit("4").as("code"), lit("book").cast("string").as("value")),
          struct(lit("h").as("code"), h("library_code").cast("string").as("value")),
          struct(lit("s").as("code"), h("location_code").cast("string").as("value")),
          struct(lit("i").as("code"),
                 when(h("l_returnflag") === "R", lit("TEMPLIB"))
                   .otherwise(h("library_code")).cast("string").as("value")),
          struct(lit("t").as("code"),
                 when(h("l_returnflag") === "R", lit("TEMPLOC"))
                   .otherwise(h("location_code")).cast("string").as("value")),
          struct(lit("x").as("code"),
                 when(h("l_linestatus") === "F", lit("1")).otherwise(lit("0"))
                   .cast("string").as("value")),
          struct(lit("g").as("code"),
                 concat(lit("copy  "), h("qty"), lit("   desc")).cast("string").as("value")),
          struct(lit("e").as("code"),
                 concat(lit("v."), h("ln")).cast("string").as("value")),
          struct(lit("f").as("code"),
                 concat(lit("Jan "), h("qty")).cast("string").as("value")),
          struct(lit("w").as("code"), h("ship_ts").cast("string").as("value")),
          struct(lit("r").as("code"), h("ship_ts").cast("string").as("value")),
          struct(lit("z").as("code"), h("ship_ts").cast("string").as("value")),
          struct(lit("3").as("code"), h("qty").cast("string").as("value")),
          struct(lit("b").as("code"), (h("ln") % 3).cast("string").as("value"))
        ).cast(SubfieldsType).as("subfields")))

    // 001 deliberately NOT first (Alma quirk the splitter must fix —
    // alma_publish_parser.py:94-99)
    val fields = concat(
      array(ctl("008", concat(date_format(col("o_orderdate"), "yyMMdd"),
                              lit("s"), year(col("o_orderdate")).cast("string"),
                              lit("    xxu           000 0 eng d"))),
            ctl("001", mmsId(col("o_orderkey"))),
            ctl("005", date_format(col("o_orderdate"), "yyyyMMddHHmmss.0"))),
      holdingControlGroups,
      bibDataFields,
      bib774,
      holding852s,
      holdingHLDs,
      itemITMs)

    o.select(
      mmsId(col("o_orderkey")).as("mms_id"),
      lit("00000cam a2200000 a 4500").as("leader"),
      fields.as("fields"))
  }
}
