package graft

import graft.geo.GridJoin

class GridJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("grid join finds overlapping pairs once, even when they span many cells") {
    // box A [0,3]×[0,1] covers cells (0,0),(1,0),(2,0) at cellSize=1;
    // box B [1.5,2.5]×[0.2,0.8] shares cells (1,0) and (2,0) with A — the
    // pair must appear exactly once. C is disjoint from everything.
    val a = Seq((1L, 0.0, 0.0, 3.0, 1.0)).toDF("aid", "ax0", "ay0", "ax1", "ay1")
    val b = Seq(
      (10L, 1.5, 0.2, 2.5, 0.8),
      (11L, 5.0, 5.0, 6.0, 6.0)).toDF("bid", "bx0", "by0", "bx1", "by1")
    val got = GridJoin.join(a, b, cellSize = 1.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("grid join honours closed intervals: edge touch counts") {
    val a = Seq((1L, 0.0, 0.0, 1.0, 1.0)).toDF("aid", "ax0", "ay0", "ax1", "ay1")
    val b = Seq((2L, 1.0, 0.0, 2.0, 1.0)).toDF("bid", "bx0", "by0", "bx1", "by1")
    assert(GridJoin.join(a, b, cellSize = 2.0).count() == 1)
  }

  test("grid join plans as an equi-join on the cell id, not a broadcast NL join") {
    val a = Seq((1L, 0.0, 0.0, 1.0, 1.0)).toDF("aid", "ax0", "ay0", "ax1", "ay1")
    val b = Seq((2L, 0.5, 0.5, 1.5, 1.5)).toDF("bid", "bx0", "by0", "bx1", "by1")
    val plan = GridJoin.join(a, b, cellSize = 1.0)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"))
    // the join keys are the grid cell columns — an equi-join Spark can
    // execute as SMJ/shuffled-hash when both sides are large
    assert(plan.contains("__cx") && plan.contains("__cy"))
  }

  test("g63 matches a brute-force overlap join on sf0.001") {
    val got = graft.queries.GeoQueries.g63GridJoin(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toMap
    // brute force with plain joins, no grid
    val px = (k: Long) => (k * 7 % 100).toDouble / 10.0
    val py = (k: Long) => (k * 13 % 100).toDouble / 10.0
    val qx = (k: Long) => (k * 11 % 200).toDouble / 20.0
    val qy = (k: Long) => (k * 17 % 200).toDouble / 20.0
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey").as[Long].collect()
    val ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey").as[Long].collect().filter(_ <= 5000)
    val expected = cust.map { c =>
      c -> ords.count { o =>
        px(c) <= qx(o) + 0.5 && qx(o) <= px(c) + 1.0 &&
        py(c) <= qy(o) + 0.5 && qy(o) <= py(c) + 1.0
      }.toLong
    }.filter(_._2 > 0).toMap
    assert(got == expected)
  }
}
