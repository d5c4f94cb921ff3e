package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level normalization functions from the reference, expressed as
  * compositions of built-in (codegen'd) functions — no UDFs.
  */
object Normalize {

  /** OCLC number formatting: strip non-digits, prefix by length
    * (ocm ≤8, ocn =9, on ≥10). Reference:
    * alma_publish_to_database.py:200-208.
    */
  def formatOclc(c: Column): Column = {
    val d = regexp_replace(c, "\\D", "")
    when(c.isNull, lit(null).cast("string"))
      .when(length(d) <= 8, concat(lit("ocm"), d))
      .when(length(d) === 9, concat(lit("ocn"), d))
      .otherwise(concat(lit("on"), d))
  }

  /** Keep only digits and dashes (isbn/issn normalization).
    * Reference: alma_publish_to_database.py:210-213.
    */
  def formatNumberDashes(c: Column): Column =
    regexp_replace(c, "[^0-9-]", "")

  /** Collapse runs of spaces (reference `rm_ws`,
    * alma_publish_to_database.py:270-272).
    */
  def normWs(c: Column): Column = regexp_replace(c, " +", " ")

  /** Suppress flag derivation: 'Y' unless the source value is the string
    * "false" (alma_publish_to_database.py:145,243).
    */
  def suppressFlag(c: Column): Column =
    when(c === lit("false"), lit("N")).otherwise(lit("Y"))
}
