package graft

import org.apache.spark.sql.functions._
import graft.operators.LookupJoin

class LookupJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val facts = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("id", "fk")

  test("Op-28 manyToOne joins when the lookup key is unique") {
    val lookup = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "name")
    val got = LookupJoin.manyToOne(facts, lookup, col("fk"), col("k"))
      .select("id", "name").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a"), (2L, "a"), (3L, "b")))
  }

  test("Op-28 manyToOne fails fast on a duplicated lookup key") {
    val dupes = Seq((10L, "a"), (10L, "a2"), (20L, "b")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      LookupJoin.manyToOne(facts, dupes, col("fk"), col("k")).collect()
    }
    assert(e.getMessage.contains("many_to_one violated"))
    assert(e.getMessage.contains("10"))
  }
}
