package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.nfcNormalize

/** Unicode NFC canonicalisation: composition/decomposition semantics,
  * idempotence, null/ASCII pass-through, and the hash-equivalence property
  * the dedup pipeline relies on. All fixtures use explicit \\u escapes —
  * a source file's visually-identical literals are useless evidence. */
class NfcNormalizeSpec extends SparkTestBase {

  import spark.implicits._

  private val Decomposed = "Cafe\u0301" // e + combining acute
  private val Precomposed = "Caf\u00e9"

  private def norm(ss: String*): Seq[String] =
    ss.zipWithIndex.map(_.swap).toDF("id", "s").orderBy("id")
      .select(nfcNormalize(col("s"))).as[String].collect().toSeq

  test("decomposed sequences recompose; precomposed and ASCII pass through") {
    val got = norm(Decomposed, Precomposed, "plain ascii")
    assert(got(0) === Precomposed, "NFC must recompose e + U+0301 to U+00E9")
    assert(got(1) === Precomposed)
    assert(got(2) === "plain ascii")
  }

  test("idempotent, and canonically-equivalent inputs hash identically " +
    "after normalization (the dedup prerequisite)") {
    val hashes = Seq(Decomposed, Precomposed).zipWithIndex.map(_.swap)
      .toDF("id", "s")
      .select(md5(nfcNormalize(col("s")))).as[String].collect().toSet
    assert(hashes.size === 1, "equivalent forms must share one content hash")
    val once = norm("A\u030a") // A + combining ring -> U+00C5
    assert(once.head === "\u00c5")
    assert(norm(once.head) === once, "normalizing twice changes nothing")
  }

  test("ordering of multiple combining marks is canonicalized") {
    // dot-below (ccc 220) must sort before dot-above (ccc 230)
    val a = "q\u0307\u0323" // dot-above then dot-below
    val b = "q\u0323\u0307" // dot-below then dot-above
    val got = norm(a, b)
    assert(got(0) === got(1), "canonical reordering must converge")
    assert(got(0) === "q\u0323\u0307")
  }

  test("null stays null") {
    val got = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "s").select(nfcNormalize(col("s"))).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) === "x")
  }
}
