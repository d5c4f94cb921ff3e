package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ConfigIngest

/** Transport for the Alma configuration REST API — pluggable because
  * this environment has no HTTP stack; a deployment drops in its
  * client of choice. Implementations perform
  * `GET <base_url><path>` with headers
  * `Authorization: apikey <token>` and `accept: application/json`
  * (alma_client.py:33-35) and return the JSON body.
  */
trait AlmaTransport extends Serializable {
  def get(path: String): String
}

/** Alma configuration API client — the endpoint surface and pagination
  * of alma_client.py, feeding DataFrames to [[graft.operators.ConfigIngest]].
  *
  * Fetching is deliberately DRIVER-side: the config API is
  * authenticated and rate-limited, payload volume is config-sized
  * (libraries × locations, never corpus-sized), and each response
  * becomes one DataFrame row — the distributed boundary starts at
  * parsing, which is `from_json` + `explode` on executors.
  */
final class AlmaConfigClient(spark: SparkSession, transport: AlmaTransport) {
  import spark.implicits._

  /** `/conf/libraries/` (alma_client.py:7-9) → one payload doc. */
  def loadLibraries(): DataFrame =
    Seq(transport.get("/conf/libraries/")).toDF("payload")

  /** `/conf/libraries/{code}/locations` per library (alma_client.py:11-13). */
  def loadLocations(libraryCodes: Seq[String]): DataFrame =
    libraryCodes.map(c =>
      (c, transport.get(s"/conf/libraries/$c/locations")))
      .toDF("library_code", "payload")

  /** `/conf/libraries/{code}/circ-desks` per library (alma_client.py:16-18). */
  def loadCircDesks(libraryCodes: Seq[String]): DataFrame =
    libraryCodes.map(c =>
      (c, transport.get(s"/conf/libraries/$c/circ-desks")))
      .toDF("library_code", "payload")

  /** `/conf/code-tables/{name}` per table (alma_client.py:20-22). */
  def loadCodeTables(names: Seq[String]): DataFrame =
    names.map(n => (n, transport.get(s"/conf/code-tables/$n")))
      .toDF("code_table", "payload")

  private val TotalCount = """"total_record_count"\s*:\s*(\d+)""".r

  /** `/conf/sets?limit=N&offset=K&set_origin=UI` — the offset
    * pagination loop (alma_client.py:25-27): pages fetched until
    * `total_record_count` is covered; each page is one payload row.
    */
  def loadSets(limit: Int = 100): DataFrame = {
    val first = transport.get(s"/conf/sets?limit=$limit&offset=0&set_origin=UI")
    val total = TotalCount.findFirstMatchIn(first).map(_.group(1).toInt).getOrElse(0)
    val rest = Iterator.from(limit, limit).takeWhile(_ < total).map(off =>
      transport.get(s"/conf/sets?limit=$limit&offset=$off&set_origin=UI")).toSeq
    (first +: rest).toDF("payload")
  }

  /** `/conf/sets/{id}` (alma_client.py:29-31). */
  def loadSet(setId: String): String = transport.get(s"/conf/sets/$setId")
}

/** The full config refresh — create_or_update_config_from_alma
  * (alma_config_to_database.py:143-155) against a [[SyncSink]]:
  * libraries → locations → circ desks + location links → code tables,
  * with the reference's conflict keys (location and circ_desk conflict
  * on (code, library_code); code_table_value on (code_table, code)).
  * Surrogate circ-desk/location ids are the Alma ids the payloads
  * already carry — no post-insert id round-trip like the reference's
  * `select id from circ_desk where …` (:120).
  */
object AlmaConfigRefresh {

  val CodeTables: Seq[String] = Seq("BaseStatus", "ItemPolicy") // :132

  def run(client: AlmaConfigClient, store: SyncSink): Map[String, Long] = {
    val libs = ConfigIngest.libraries(client.loadLibraries())
    store.upsert("library", libs, Seq("code"))
    val libraryCodes = libs.select("code").collect().map(_.getString(0)).toSeq

    val locs = ConfigIngest.locations(client.loadLocations(libraryCodes))
    store.upsert("location",
      locs.select("code", "library_code", "id", "external_name", "name", "suppress"),
      Seq("code", "library_code"))

    val desks = ConfigIngest.circDesks(client.loadCircDesks(libraryCodes))
    store.upsert("circ_desk",
      desks.select(col("code"), col("library_code"), col("id"), col("name"),
        col("primary_desk"), col("reading_room_desk")),
      Seq("code", "library_code"))
    store.insertOnly("location_circ_desk",
      ConfigIngest.locationCircDeskLinks(desks,
        locs.select(col("id"), col("library_code"), col("code"))),
      Seq("circ_desk_id", "location_id"))

    val codeTables = ConfigIngest.codeTables(client.loadCodeTables(CodeTables))
    store.upsert("code_table_value", codeTables, Seq("code_table", "code"))

    refreshSets(client, store)

    Map(
      "libraries" -> libraryCodes.size.toLong,
      "locations" -> store.read("location").count(),
      "circ_desks" -> store.read("circ_desk").count(),
      "code_table_values" -> store.read("code_table_value").count(),
      "record_sets" -> store.read("record_set").count())
  }

  /** UI-origin sets → the `record_set` table (ddl: alma_id, name,
    * set_json): the paginated index (alma_client.py:25-27) plus one
    * `/conf/sets/{id}` detail fetch per set for set_json, keyed on
    * alma_id (ddl's indexed lookup column).
    */
  def refreshSets(client: AlmaConfigClient, store: SyncSink,
                  limit: Int = 100): Long = {
    val index = ConfigIngest.setsIndex(client.loadSets(limit))
    val ids = index.select("alma_id").collect().map(_.getString(0)).toSeq
    val spark = index.sparkSession
    import spark.implicits._
    val detail = ids.map(id => (id, client.loadSet(id))).toDF("alma_id", "set_json")
    store.upsert("record_set", index.join(detail, Seq("alma_id"))
      .select("alma_id", "name", "set_json"), Seq("alma_id"))
    ids.size.toLong
  }
}
