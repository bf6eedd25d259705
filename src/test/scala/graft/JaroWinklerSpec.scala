package graft

import org.apache.spark.sql.functions._

import graft.functions.{JaroWinkler, TextFunctions}

/** Native Jaro-Winkler expression: fixture values independently verified
  * against DuckDB's jaro_winkler_similarity (the oracle comparator), plus
  * the structural properties of the metric. */
class JaroWinklerSpec extends SparkTestBase {

  import spark.implicits._

  // (a, b, expected) — expected values are DuckDB jaro_winkler_similarity
  // outputs, captured verbatim (full double precision)
  private val duckdbFixture = Seq(
    ("", "", 0.0),
    ("a", "", 0.0),
    ("abc", "abc", 1.0),
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.8400000000000001),
    ("ab", "ba", 0.0),
    ("abcd", "badc", 0.8333333333333334),
    ("crate", "trace", 0.7333333333333334),
    ("hello", "h", 0.76),
    ("abcdefgh", "abcdefgh123", 0.9454545454545455),
    ("x", "y", 0.0),
    ("aa", "ab", 0.6666666666666666), // jaro 2/3 ≤ 0.7: NO prefix boost
    ("appel", "applet", 0.9144444444444445),
    ("kitten", "sitting", 0.746031746031746),
    ("ABANY RD", "ALBANY ROAD", 0.9181818181818182))

  test("similarity matches DuckDB's jaro_winkler_similarity bit-for-bit") {
    duckdbFixture.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a, b)
      assert(got === want, s"jw('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("expression evaluates through the column API and handles nulls") {
    val df = duckdbFixture.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
    val bad = df.select(TextFunctions.jaroWinkler(col("a"), col("b")) =!= col("want"))
      .as[Boolean].collect()
    assert(!bad.exists(identity), "column evaluation must match the fixture")
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0), "null input yields null, not 0")
  }

  test("metric properties: symmetry, range, prefix boost monotonicity") {
    val words = Seq("street", "road", "avenue", "albert", "alberta", "albany",
      "kloof", "kloofnek", "main", "mains", "", "x", "xy")
    for (a <- words; b <- words) {
      val ab = JaroWinkler.similarity(a, b)
      assert(ab === JaroWinkler.similarity(b, a), s"symmetry: '$a' '$b'")
      assert(ab >= 0.0 && ab <= 1.0, s"range: '$a' '$b' -> $ab")
      if (a == b && a.nonEmpty) assert(ab === 1.0)
    }
    // shared prefix raises the winkler score for equal jaro structure
    assert(JaroWinkler.similarity("albert", "alberx") >
      JaroWinkler.similarity("talber", "xalber") ||
      JaroWinkler.similarity("talber", "xalber") <= 0.7)
  }

  test("SQL surface: jaro_winkler registered via GraftExtensions") {
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").as[Double].head()
    assert(got === 0.9611111111111111)
  }

  test("scratch reuse: long strings after short ones stay correct") {
    val long1 = "a" * 100 + "suffix"
    val long2 = "a" * 100 + "suffixx"
    val s1 = JaroWinkler.similarity("ab", "ba")
    val s2 = JaroWinkler.similarity(long1, long2)
    assert(s1 === 0.0 && s2 > 0.9, "growth path must not corrupt state")
    // and via one shared expression instance over mixed-length rows
    val df = Seq(("ab", "ba"), (long1, long2), ("martha", "marhta"))
      .toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
    val vals = df.as[Double].collect()
    assert(vals(0) === 0.0 && vals(1) > 0.9 && vals(2) === 0.9611111111111111)
  }
}
