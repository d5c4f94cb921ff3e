package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alma configuration ingest: JSON API payloads → library / location /
  * circ_desk dimensions, the location_circ_desk link table, and
  * code_table values.
  *
  * Re-expresses alma_config_to_database.py: the reference walks JSON
  * dicts row-at-a-time and resolves the circ-desk→location link through
  * a driver-side dict (`location_id_dict`, lines 54-63, 105-127); here
  * every payload is a row, parsing is `from_json` + `explode`, and the
  * surrogate-key resolution is a broadcast join — no driver state.
  */
object ConfigIngest {

  private val LibrarySchema =
    "STRUCT<library: ARRAY<STRUCT<id: STRING, code: STRING, name: STRING," +
    " path: STRING, description: STRING," +
    " campus: STRUCT<value: STRING, description: STRING>>>>"

  private val LocationSchema =
    "STRUCT<location: ARRAY<STRUCT<id: BIGINT, code: STRING," +
    " external_name: STRING, name: STRING, suppress_from_publishing: STRING>>>"

  private val CircDeskSchema =
    "STRUCT<circ_desk: ARRAY<STRUCT<id: BIGINT, code: STRING, name: STRING," +
    " primary: STRING, reading_room_desk: STRING," +
    " location: ARRAY<STRUCT<location_code: STRING>>>>>"

  private val CodeTableSchema =
    "STRUCT<row: ARRAY<STRUCT<code: STRING, description: STRING>>>"

  /** `{"library":[...]}` doc(s) → library dimension (store_libraries). */
  def libraries(docs: DataFrame, payloadCol: String = "payload"): DataFrame =
    docs.select(explode(
        from_json(col(payloadCol), LibrarySchema, Map.empty[String, String])("library")).as("l"))
      .select(col("l")("code").as("code"), col("l")("name").as("name"),
              col("l")("id").as("alma_id"), col("l")("path").as("path"),
              col("l")("description").as("description"),
              col("l")("campus")("value").as("campus"),
              col("l")("campus")("description").as("campus_description"))

  /** Per-library `{"location":[...]}` payloads → location dimension
    * with the reference's suppress derivation (store_locations:90).
    */
  def locations(docs: DataFrame, libraryCodeCol: String = "library_code",
                payloadCol: String = "payload"): DataFrame =
    docs.select(col(libraryCodeCol).as("library_code"), explode(
        from_json(col(payloadCol), LocationSchema, Map.empty[String, String])("location")).as("l"))
      .select(col("l")("id").as("id"), col("l")("code").as("code"),
              col("library_code"),
              col("l")("external_name").as("external_name"),
              col("l")("name").as("name"),
              when(col("l")("suppress_from_publishing") === "false", lit("N"))
                .otherwise(lit("Y")).as("suppress"))

  /** Per-library `{"circ_desk":[...]}` payloads → circ_desk dimension. */
  def circDesks(docs: DataFrame, libraryCodeCol: String = "library_code",
                payloadCol: String = "payload"): DataFrame =
    docs.select(col(libraryCodeCol).as("library_code"), explode(
        from_json(col(payloadCol), CircDeskSchema, Map.empty[String, String])("circ_desk")).as("d"))
      .select(col("d")("id").as("id"), col("d")("code").as("code"),
              col("library_code"), col("d")("name").as("name"),
              col("d")("primary").as("primary_desk"),
              col("d")("reading_room_desk").as("reading_room_desk"),
              col("d")("location").as("__locations"))

  /** The location_circ_desk link table: each desk's served locations
    * resolved to surrogate ids via a broadcast join on
    * (library_code, location_code) — the distributed twin of
    * `lookup_location` (store_circ_desks:105-127; unknown codes are
    * dropped exactly as the reference's `if location_id:` does).
    */
  def locationCircDeskLinks(desks: DataFrame, locationDim: DataFrame): DataFrame = {
    val served = desks.select(col("id").as("circ_desk_id"), col("library_code"),
        explode(col("__locations")).as("loc"))
      .select(col("circ_desk_id"), col("library_code"),
              col("loc")("location_code").as("location_code"))
    served.join(
        broadcast(locationDim.select(col("id").as("location_id"),
          col("library_code"), col("code").as("location_code"))),
        Seq("library_code", "location_code"))
      .select(col("circ_desk_id"), col("location_id"))
  }

  private val SetsSchema =
    "STRUCT<total_record_count: BIGINT," +
    " set: ARRAY<STRUCT<id: STRING, name: STRING>>>"

  /** `/conf/sets` page payloads → (alma_id, name) index rows
    * (alma_client.py load_sets pages; ddl record_set).
    */
  def setsIndex(docs: DataFrame, payloadCol: String = "payload"): DataFrame =
    docs.select(explode(
        from_json(col(payloadCol), SetsSchema, Map.empty[String, String])("set")).as("s"))
      .select(col("s")("id").as("alma_id"), col("s")("name").as("name"))

  /** Code-table payloads → code_table_value rows (store_code_tables). */
  def codeTables(docs: DataFrame, tableNameCol: String = "code_table",
                 payloadCol: String = "payload"): DataFrame =
    docs.select(col(tableNameCol).as("code_table"), explode(
        from_json(col(payloadCol), CodeTableSchema, Map.empty[String, String])("row")).as("r"))
      .select(col("code_table"), col("r")("code").as("code"),
              col("r")("description").as("description"))
}
