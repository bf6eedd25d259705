package graft

import org.apache.spark.sql.functions._
import graft.core.FixerColumns

/** Ops 16-25 scalar semantics, including the reference's edge quirks
  * (SURVEY.md §2.3). */
class FixerColumnsSpec extends SparkTestBase {
  import spark.implicits._

  test("Op-16 zero-pad: only exact 10-digit strings pass") {
    val df = Seq("1234567890", "123456789", "12345678901", "12a4567890", null)
      .toDF("nn")
    val got = df.select(FixerColumns.zeroPadNotification($"nn").as("out"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("001234567890"), None, None, None, None))
  }

  test("Op-17 planned flag: enum to nullable boolean") {
    val df = Seq("Planned", "Unplanned", "other", null).toDF("p")
    val got = df.select(FixerColumns.plannedFlag($"p").as("out"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(got == Seq(Some(true), Some(false), None, None))
  }

  test("Op-21 dirty time: substring-global replace semantics") {
    val df = Seq("23:60", "Select...", "12:30", "16:00").toDF("t")
    val got = df.select(FixerColumns.cleanTimeString($"t").as("out"))
      .as[String].collect().toSeq
    // "16:00" has no "60" substring (chars 6 and 0 are separated by ':')
    assert(got == Seq("23:59", "00:00", "12:30", "16:00"))
  }

  test("Op-22 guarded parse: junk and invalid clock values -> null") {
    val df = Seq("12:34", "junk", "7:30", "25:99", null).toDF("t")
    val got = df.select(FixerColumns.guardedTimeParse($"t").as("out"))
      .collect().map(r => !r.isNullAt(0)).toSeq
    assert(got == Seq(true, false, false, false, false))
  }

  test("Op-24 rollover: end <= start rolls to next day") {
    val df = Seq(
      ("2024-01-01 22:00:00", "2024-01-01 02:00:00"),  // overnight -> +1d
      ("2024-01-01 08:00:00", "2024-01-01 17:00:00"),  // normal
      ("2024-01-01 08:00:00", "2024-01-01 08:00:00"))  // equal -> +1d
      .toDF("s", "e")
      .select(to_timestamp($"s").as("s"), to_timestamp($"e").as("e"))
    val got = df.select(FixerColumns.rolloverEnd($"s", $"e").cast("string").as("out"))
      .as[String].collect().toSeq
    assert(got == Seq("2024-01-02 02:00:00", "2024-01-01 17:00:00",
      "2024-01-02 08:00:00"))
  }

  test("Op-25 location coalesce: prefix-overlap dup falls back") {
    val df = Seq(
      ("Main Rd burst pipe", "Main Rd burst pipe near mall", "fb"), // loc prefix of desc -> fb
      ("Station Rd", "Unrelated description", "fb"),                // kept
      (null, "desc", "fb"),                                         // null loc -> fb
      ("loc only", null, "fb"))                                     // null desc -> loc
      .toDF("loc", "desc", "fb")
    val got = df.select(
      FixerColumns.locationCoalesce($"loc", $"desc", $"fb").as("out"))
      .as[String].collect().toSeq
    assert(got == Seq("fb", "Station Rd", "fb", "loc only"))
  }
}
