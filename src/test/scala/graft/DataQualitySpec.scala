package graft

import org.apache.spark.sql.functions._

import graft.ext.DataQualityOps
import graft.ext.DataQualityOps._

/** Profiles and constraint gates: hand-built dirty fixtures, violation
  * counts, and the one-scan plan shape. */
class DataQualitySpec extends SparkTestBase {

  import spark.implicits._

  private val dirty = Seq(
    (Some(1L), Some("a"), Some(10.0)),
    (Some(2L), None, Some(-5.0)),       // null name, below range
    (Some(2L), Some("b"), Some(50.0)),  // duplicate key
    (None, Some("c"), Some(200.0)),     // null key, above range
    (Some(4L), Some("c"), None)
  ).toDF("id", "name", "x")

  test("profile: null and distinct counts per column, one row each") {
    val got = DataQualityOps.profile(dirty, Seq("id", "name", "x"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("id") === ((5L, 1L, 3L)))   // 5 rows, 1 null, {1,2,4}
    assert(got("name") === ((5L, 1L, 3L))) // {a,b,c}
    assert(got("x") === ((5L, 1L, 4L)))
  }

  test("profile: exact and approx agree on small cardinalities; one scan") {
    val ex = DataQualityOps.profile(dirty, Seq("id", "name"))
      .as[(String, Long, Long, Long)].collect().toSet
    val ap = DataQualityOps.profile(dirty, Seq("id", "name"), exact = false)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(ex === ap) // HLL is exact at these cardinalities
    val plan = DataQualityOps.profile(
        spark.read.parquet(sf() + "/orders.parquet"),
        Seq("o_orderkey", "o_custkey"))
      .queryExecution.executedPlan.toString
    assert("FileScan|Scan parquet".r.findAllIn(plan).size === 1,
      s"profile must scan once:\n$plan")
  }

  test("check: violation counts for null / unique / range in one scan") {
    val got = DataQualityOps.check(dirty, Seq(
        NotNull("name"), UniqueKey("id"), InRange("x", 0.0, 100.0)))
      .as[(String, Long)].collect().toMap
    assert(got("not_null(name)") === 1L)
    // 5 rows - 3 distinct non-null ids = 2 (the dup AND the null key)
    assert(got("unique(id)") === 2L)
    assert(got("range(x,0.0,100.0)") === 2L) // -5 and 200; null exempt
    val plan = DataQualityOps.check(dirty, Seq(NotNull("name"),
        InRange("x", 0.0, 100.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"scan constraints must not join:\n$plan")
  }

  test("profile and check survive column names with spaces and quotes") {
    val odd = Seq((Some(1L), 2L), (None, 3L)).toDF("order key", "it's")
    val p = DataQualityOps.profile(odd, Seq("order key", "it's"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(p("order key") === ((1L, 1L)) && p("it's") === ((0L, 2L)))
    val c = DataQualityOps.check(odd, Seq(NotNull("order key")))
      .as[(String, Long)].collect().toMap
    assert(c("not_null(order key)") === 1L)
  }

  test("checkForeignKey: orphans counted, null FKs exempt, empty parent") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(3L), Some(9L), None).toDF("fk")
    val got = DataQualityOps.checkForeignKey(child, "fk", parent, "pk")
      .as[(String, Long)].collect().head
    assert(got === (("foreign_key(fk)", 2L)))
    val empty = spark.emptyDataset[Long].toDF("pk")
    assert(DataQualityOps.checkForeignKey(child, "fk", empty, "pk")
      .as[(String, Long)].collect().head._2 === 3L)
  }

  test("the gate passes on the clean testdata (all-zero violations)") {
    val got = graft.queries.ExtQueries.xDqCheck(spark, sf())
      .as[(String, Long)].collect().toMap
    assert(got.size === 4 && got.values.forall(_ == 0L), got.toString)
  }
}
