package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column functions for OData (SAP ByD dialect) value handling.
  *
  * The reference never parses `/Date(ms)/` legacy timestamps — they
  * survive verbatim to the CSV (reference `src/etl.py`, sample row in
  * `data/employee_data.csv:2`). Typed decode is therefore an opt-in
  * layer here, built from codegen'd built-ins (regexp_extract +
  * timestamp_millis) — no UDF, stays inside whole-stage codegen.
  */
object ODataFunctions {

  private val DateRe = "^/Date\\((-?\\d+)\\)/$"

  /** `/Date(1776729600000)/` → TimestampType (UTC). Non-matching or
    * null input → null. The rlike guard keeps the cast total under
    * ANSI mode (Spark 4 default): regexp_extract returns "" on
    * no-match, and ANSI cast(''):bigint throws.
    */
  def odataDateDecode(c: Column): Column =
    when(c.rlike(DateRe),
      timestamp_millis(regexp_extract(c, DateRe, 1).cast(LongType)))

  /** TimestampType → `/Date(ms)/` string (inverse of decode). The
    * cast lifts TIMESTAMP_NTZ inputs (parquet isAdjustedToUTC=false)
    * to TIMESTAMP under the session zone — the engine runs UTC, so
    * the epoch value is preserved.
    */
  def odataDateEncode(c: Column): Column =
    concat(lit("/Date("), unix_millis(c.cast("timestamp")).cast("string"), lit(")/"))

  /** OData string-literal escape: single quotes double (reference
    * `src/etl.py:147`). Control-plane (filter translation), data-plane
    * variant provided for completeness.
    */
  def odataQuoteEscape(s: String): String = s.replace("'", "''")

  def odataQuoteEscape(c: Column): Column =
    regexp_replace(c, "'", "''")

  /** Build an OData `$filter` equality clause: `field eq 'value'`. */
  def odataEqFilter(field: String, value: String): String =
    s"$field eq '${odataQuoteEscape(value)}'"
}
