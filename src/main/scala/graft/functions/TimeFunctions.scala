package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time scalar functions — the reference's DateTime/Time methods
  * (/root/reference/amadeus-types/src/time.rs) as native column
  * expressions (no UDFs, all codegen'd).
  */
object TimeFunctions {

  /** truncate_minutes(n) (time.rs:573-580): floor to an n-minute bucket.
    * Epoch-second arithmetic, identical in any engine. */
  def truncateMinutes(c: Column, minutes: Int): Column =
    timestamp_seconds(floor(unix_timestamp(c) / (60L * minutes)) * (60L * minutes))

  // part getters (time.rs:528-547)
  def yearOf(c: Column): Column = year(c)
  def monthOf(c: Column): Column = month(c)
  def dayOf(c: Column): Column = dayofmonth(c)
  def hourOf(c: Column): Column = hour(c)
  def minuteOf(c: Column): Column = minute(c)
  def secondOf(c: Column): Column = second(c)
  /** sub-second micros (reference exposes nanosecond; parquet carries μs) */
  def microsOf(c: Column): Column =
    (unix_micros(c) % 1000000L).cast("long")

  /** with_timezone / without_timezone (time.rs:654, :522-526):
    * interpret/strip a zone on a naive timestamp */
  def withTimezone(c: Column, tz: String): Column = to_utc_timestamp(c, tz)
  def withoutTimezone(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
}
