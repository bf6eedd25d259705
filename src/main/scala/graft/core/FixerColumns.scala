package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar canonicalisation expressions (the reference's "Fixer" stage).
  *
  * Each function is a pure Catalyst column expression — no UDFs — so
  * predicate pushdown / constant folding / whole-stage codegen all apply.
  * Semantics derived from `/root/reference/src/cct_connector/ServiceAlertFixer.py`
  * (see SURVEY.md §2.3, Ops 16-27).
  */
object FixerColumns {

  /** Op-16 (ServiceAlertFixer.py:17-18,27-29): a notification number is kept
    * only when it is exactly 10 digits, then zero-padded to 12; else NULL. */
  def zeroPadNotification(c: Column): Column =
    when(c.rlike("^[0-9]{10}$"), lpad(c, 12, "0"))

  /** Op-17 (ServiceAlertFixer.py:31): enum → nullable boolean. */
  def plannedFlag(c: Column, trueVal: String = "Planned", falseVal: String = "Unplanned"): Column =
    when(c === trueVal, lit(true)).when(c === falseVal, lit(false))

  /** Op-18 (ServiceAlertFixer.py:33-34): parse ISO-8601 instants. The
    * reference converts to +02:00 wall time; instants are unchanged, so the
    * engine stores UTC instants and exposes SAST wall time on demand. */
  def parseIso(c: Column): Column = to_timestamp(c)

  /** SAST (UTC+02:00, no DST) wall-clock view of a UTC instant. */
  def sastWallClock(ts: Column): Column = ts + expr("INTERVAL 2 HOURS")

  /** Op-19 (ServiceAlertFixer.py:36-39): expiry is the day AFTER the recorded
    * date — alerts lapse at the end of the stated day. */
  def expiryDate(c: Column): Column = c + expr("INTERVAL 1 DAY")

  /** Op-20 (ServiceAlertFixer.py:41): duration = expiry - publish, exposed as
    * whole seconds (engine-portable; avoids interval-type round-trip skew). */
  def durationSeconds(expiry: Column, publish: Column): Column =
    (unix_timestamp(expiry) - unix_timestamp(publish)).as("duration_sec")

  /** Op-21 (ServiceAlertFixer.py:43-45): dirty "HH:MM" strings. The reference
    * uses Python substring-global replace — "60"→"59" anywhere in the string,
    * then the "Select..." placeholder → "00:00". Patterns are escaped so the
    * replace stays literal-substring, matching Python `str.replace`. */
  def cleanTimeString(c: Column): Column =
    regexp_replace(regexp_replace(c, lit("60"), lit("59")),
      lit("Select\\.\\.\\."), lit("00:00"))

  /** Op-22 (ServiceAlertFixer.py:19,46-52): parse only when the value looks
    * like a clock time; junk → NULL instead of a parse error. */
  def guardedTimeParse(c: Column): Column =
    when(c.rlike("^[0-9]{2}:[0-9]{2}$"),
      to_timestamp(concat(lit("1970-01-01 "), c), "yyyy-MM-dd HH:mm"))

  /** Op-23 (ServiceAlertFixer.py:54-65): combine a date's day with a separate
    * "HH:MM" time-of-day string into one timestamp. */
  def combineDateTime(d: Column, hhmm: Column): Column =
    to_timestamp(concat(date_format(d, "yyyy-MM-dd"), lit(" "), hhmm),
      "yyyy-MM-dd HH:mm")

  /** Op-24 (ServiceAlertFixer.py:81-88): overnight-work rollover — a forecast
    * end at/before the start means it lands on the next day. */
  def rolloverEnd(start: Column, end: Column): Column =
    when(end.isNotNull && start.isNotNull && end <= start,
      end + expr("INTERVAL 1 DAY")).otherwise(end)

  /** Op-25 (ServiceAlertFixer.py:66-80): keep the free-text location only when
    * it is NOT a prefix-overlap duplicate of the description
    * (`a[:len(b)] != b[:len(a)]` in the reference), else fall back. */
  def locationCoalesce(locRaw: Column, desc: Column, fallback: Column): Column = {
    val prefixDistinct =
      locRaw.substr(lit(1), length(desc)) =!= desc.substr(lit(1), length(locRaw))
    when(locRaw.isNotNull && desc.isNotNull && prefixDistinct, locRaw)
      .when(locRaw.isNotNull && desc.isNull, locRaw)
      .otherwise(fallback)
  }
}
