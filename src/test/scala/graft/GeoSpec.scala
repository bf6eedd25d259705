package graft

import org.apache.spark.sql.functions._

import graft.geo.Geometry._
import graft.geo.{GeoFunctions, SpatialJoin}

/** Kernel + column-function semantics for the geospatial operators. */
class GeoSpec extends SparkTestBase {
  import spark.implicits._

  test("WKT round-trip at 6 dp for all shapes") {
    val cases = Seq(
      "POINT (1.5 -2.25)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    cases.foreach { w => assert(parseWkt(w).map(toWkt).contains(w)) }
    // 6-dp quantisation
    assert(toWkt(GPoint(Pt(1.23456789, 0.0000004))) == "POINT (1.234568 0)")
    assert(parseWkt("garbage").isEmpty && parseWkt(null).isEmpty)
  }

  test("binary codec: bit-exact round-trip, header bbox matches kernel " +
    "bbox, expressions agree with the WKT UDFs incl. null/garbage") {
    import graft.geo.GeomCodec
    val cases = Seq(
      "POINT (1.5 -2.25)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "MULTIPOLYGON EMPTY",
      "GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0)))",
      // non-grid coordinates: doubles must survive the codec untouched
      "POLYGON ((0.1234567891 0.987654321, 3.333333333 0.1, 1.7 2.9999999999, 0.1234567891 0.987654321))")
    cases.foreach { w =>
      val g = parseWkt(w).get
      assert(GeomCodec.decode(GeomCodec.encode(g)) == g, w)
      assert(GeomCodec.decodeCached(GeomCodec.encode(g)) == g, w)
    }
    // header overlap == kernel bbox overlap for every pair (incl. empties)
    val encoded = cases.map(w => parseWkt(w).get).map(g => (g, GeomCodec.encode(g)))
    for ((ga, ba) <- encoded; (gb, bb) <- encoded) {
      val (alo, ahi) = bbox(ga); val (blo, bhi) = bbox(gb)
      val kernelOverlap = alo.x <= bhi.x && blo.x <= ahi.x &&
        alo.y <= bhi.y && blo.y <= ahi.y
      assert(GeomCodec.headerOverlap(ba, bb) == kernelOverlap, s"$ga vs $gb")
    }
    // expression tier vs UDF tier on a frame with garbage and null WKT
    import graft.functions.GeoExpressions._
    val df = (cases ++ Seq("garbage", null)).zipWithIndex
      .map { case (w, i) => (i, w) }.toDF("id", "wkt")
      .withColumn("g", stGeomFromWkt(col("wkt")))
    val both = df.select(col("id"),
        stAreaBin(col("g")).as("bin_area"),
        GeoFunctions.stArea(col("wkt")).as("udf_area"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), r.toString)
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2), r.toString)
    }
    val pairs = df.as("a").crossJoin(df.as("b")).select(
      stIntersectsBin(col("a.g"), col("b.g")).as("bin_int"),
      GeoFunctions.stIntersects(col("a.wkt"), col("b.wkt")).as("udf_int"),
      stIntersectionAreaBin(col("a.g"), col("b.g")).as("bin_ia"),
      GeoFunctions.stIntersectionArea(col("a.wkt"), col("b.wkt")).as("udf_ia"))
      .collect()
    pairs.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1), r.toString)
      assert(r.isNullAt(2) == r.isNullAt(3), r.toString)
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), r.toString)
    }
  }

  test("shoelace area: square, triangle, multipolygon sum") {
    assert(area(box(0, 0, 2, 3)) == 6.0)
    assert(area(GPolygon(Vector(Pt(0, 0), Pt(4, 0), Pt(0, 3)))) == 6.0)
    assert(area(GMulti(Vector(box(0, 0, 1, 1), box(5, 5, 7, 7)))) == 5.0)
  }

  test("intersects: disjoint, overlapping, containment, touching, point/line") {
    val a = box(0, 0, 2, 2)
    assert(!intersects(a, box(3, 3, 4, 4)))
    assert(intersects(a, box(1, 1, 3, 3)))
    assert(intersects(a, box(0.5, 0.5, 1.5, 1.5)))   // contained
    assert(intersects(box(0.5, 0.5, 1.5, 1.5), a))   // contains
    assert(intersects(a, box(2, 0, 3, 2)))           // edge-touching
    assert(intersects(GPoint(Pt(1, 1)), a))
    assert(!intersects(GPoint(Pt(9, 9)), a))
    assert(intersects(GLine(Vector(Pt(-1, 1), Pt(3, 1))), a))  // crossing line
    assert(!intersects(GLine(Vector(Pt(-1, 5), Pt(3, 5))), a))
  }

  test("intersection area via convex clipping") {
    assert(intersectionArea(box(0, 0, 2, 2), box(1, 1, 3, 3)) == 1.0)
    assert(intersectionArea(box(0, 0, 2, 2), box(0.5, 0.5, 1.5, 1.5)) == 1.0)
    assert(intersectionArea(box(0, 0, 2, 2), box(5, 5, 6, 6)) == 0.0)
    // triangle {x>=1, y>=1, x+y<=6} clipped by [0,3]^2 -> the square [1,3]^2
    val tri = GPolygon(Vector(Pt(1, 1), Pt(5, 1), Pt(1, 5)))
    assert(math.abs(intersectionArea(tri, box(0, 0, 3, 3)) - 4.0) < 1e-9)
  }

  test("buffer envelope and makeValid") {
    assert(toWkt(bufferEnv(GPoint(Pt(1, 1)), 0.5)) ==
      "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))")
    val dirty = GPolygon(Vector(Pt(0, 0), Pt(0, 0), Pt(1, 0), Pt(1, 1)))
    assert(makeValid(dirty) == GPolygon(Vector(Pt(0, 0), Pt(1, 0), Pt(1, 1))))
  }

  test("union aggregate: deterministic multipolygon, summed area") {
    val df = Seq("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))").toDF("wkt")
    val u = df.agg(GeoFunctions.stUnionAggOn($"wkt").as("u"))
      .select("u").as[String].head()
    assert(u.startsWith("MULTIPOLYGON"))
    assert(parseWkt(u).map(area).contains(5.0))
  }

  test("union aggregate compaction knob: spark.graft.geo.unionAggMaxPending " +
    "is read at Column-build time and a maximally-compacting setting (1) " +
    "yields the identical result on the quantised-grid domain") {
    val wkts = (0 until 20).map { i =>
      val x = (i % 5) * 1.5; val y = (i / 5) * 1.5
      s"POLYGON (($x $y, ${x + 2} $y, ${x + 2} ${y + 2}, $x ${y + 2}, $x $y))"
    }
    val df = wkts.toDF("wkt")
    def unionWith(maxPending: Option[String]): String = {
      maxPending match {
        case Some(v) => spark.conf.set(GeoFunctions.UnionAggMaxPendingKey, v)
        case None    => spark.conf.unset(GeoFunctions.UnionAggMaxPendingKey)
      }
      try df.agg(GeoFunctions.stUnionAggOn($"wkt").as("u"))
        .select("u").as[String].head()
      finally spark.conf.unset(GeoFunctions.UnionAggMaxPendingKey)
    }
    val default = unionWith(None)
    val compacting = unionWith(Some("1"))      // compacts after every member
    val oversized = unionWith(Some("1000"))    // never trips the threshold
    assert(compacting === default)
    assert(oversized === default)
  }

  test("true buffer: disc area, square growth, hole erosion, line sweep") {
    import graft.geo.Geometry._
    val d = 2.0
    val n = 32 // 4 * quadSegs(8)
    val discArea = 0.5 * n * d * d * math.sin(2 * math.Pi / n)
    // point -> inscribed 32-gon of the disc
    val p = buffer(GPoint(Pt(5, 5)), d)
    assert(math.abs(area(p) - discArea) < 1e-9)
    // square side s grown by d: s^2 + 4sd + (32-gon corner quadrants)
    val s = 10.0
    val sq = buffer(box(0, 0, s, s), d)
    assert(math.abs(area(sq) - (s * s + 4 * s * d + discArea)) < 1e-6)
    // a 10x10 ring with a 2x2 hole: buffering by 2 must CLOSE the hole
    // (narrower than 2d) — the envelope approximation can't do this
    val holed = GPolygon(box(0, 0, 10, 10).ring, Vector(box(4, 4, 6, 6).ring))
    val bh = buffer(holed, d)
    assert(math.abs(area(bh) - (100.0 + 4 * 10 * d + discArea)) < 1e-6)
    // line of length L -> capsule: 2*L*d + disc
    val ln = buffer(GLine(Vector(Pt(0, 0), Pt(7, 0))), d)
    assert(math.abs(area(ln) - (2 * 7 * d + discArea)) < 1e-6)
    // envelope stays the cheap over-approximation
    assert(area(bufferEnv(GPoint(Pt(0, 0)), d)) == 16.0)
  }

  test("difference: hole creation, split into multipolygon, hole-aware inputs") {
    // subtracting a polygon strictly inside creates a HOLE
    val holed = difference(box(0, 0, 10, 10), box(4, 4, 6, 6))
    assert(math.abs(area(holed) - 96.0) < 1e-9)
    holed match {
      case GPolygon(_, hs) => assert(hs.length == 1 && math.abs(ringArea(hs.head) - 4.0) < 1e-9)
      case other => fail(s"expected a single holed polygon, got ${toWkt(other)}")
    }
    // subtracting a band through the middle SPLITS it
    val split = difference(box(0, 0, 10, 4), box(4, -1, 6, 5))
    assert(math.abs(area(split) - 32.0) < 1e-9)
    split match {
      case GMulti(ps) => assert(ps.length == 2)
      case other => fail(s"expected a 2-part multipolygon, got ${toWkt(other)}")
    }
    // subtracting FROM a holed polygon: both the hole and the cut survive
    val donut = GPolygon(box(0, 0, 10, 10).ring, Vector(box(4, 4, 6, 6).ring))
    val cut = difference(donut, box(-1, -1, 2, 11))
    assert(math.abs(area(cut) - (96.0 - 20.0)) < 1e-9)
    // a \ b leaves b's own holes behind: subtracting a donut keeps its hole
    val keepHole = difference(box(0, 0, 10, 10), donut)
    assert(math.abs(area(keepHole) - 4.0) < 1e-9)
  }

  test("negative buffer: erosion grows holes, splits necks, empties points") {
    // donut eroded by 1: outer shrinks to the exact 8×8 (convex corners),
    // the hole grows into its own DILATION — a rounded-corner square
    // (erosion excludes every point within d of the hole, and the set
    // within d of a square has quarter-disc corners): 2×2 + perimeter·d
    // + 32-gon disc
    val donut = GPolygon(box(0, 0, 10, 10).ring, Vector(box(4, 4, 6, 6).ring))
    val er = buffer(donut, -1.0)
    val disc1 = 0.5 * 32 * math.sin(2 * math.Pi / 32) // 32-gon disc, r=1
    assert(math.abs(area(er) - (64.0 - (4.0 + 8.0 + disc1))) < 1e-6, toWkt(er))
    // dumbbell: two 4x4 plates joined by a 0.5-wide neck — eroding by 0.5
    // severs the neck into two parts
    val dumbbell = unionDissolve(Seq(
      box(0, 0, 4, 4), box(6, 0, 10, 4), box(4, 1.75, 6, 2.25)))
    val severed = buffer(dumbbell, -0.5)
    severed match {
      case GMulti(ps) => assert(ps.length == 2, toWkt(severed))
      case other => fail(s"expected 2 parts, got ${toWkt(other)}")
    }
    // each plate erodes to ~3×3 plus a small bump at the severed neck mouth
    // (the boundary there is the neck walls, not the plate edge)
    assert(area(severed) >= 18.0 && area(severed) < 18.1, area(severed))
    // opening (erode-then-dilate) stays within the original box
    val opened = buffer(buffer(box(0, 0, 6, 6), -1.0), 1.0)
    assert(area(opened) <= 36.0 + 1e-9 && area(opened) > 34.0)
    // zero-interior inputs erode to empty
    assert(area(buffer(GPoint(Pt(1, 1)), -0.5)) == 0.0)
    assert(area(buffer(GLine(Vector(Pt(0, 0), Pt(5, 0))), -0.5)) == 0.0)
  }

  test("SQL-string surface: registered st_* functions compose in spark.sql") {
    graft.geo.GeoFunctions.register(spark)
    val area = spark.sql(
      """SELECT round(st_area(st_buffer(st_point(0D, 0D), 2D)), 4) AS a,
        |       st_intersects(st_box(0D,0D,2D,2D), st_box(2D,0D,4D,2D)) AS touches,
        |       round(st_intersection_area(st_box(0D,0D,2D,2D), st_box(1D,0D,3D,2D)), 4) AS inter,
        |       round(st_difference_area(st_box(0D,0D,2D,2D), st_box(1D,0D,3D,2D)), 4) AS diff,
        |       round(st_area(st_difference(st_box(0D,0D,2D,2D), st_box(1D,0D,3D,2D))), 4) AS diff2,
        |       round(st_area(st_buffer(st_box(0D,0D,4D,4D), -1D)), 4) AS eroded
        |""".stripMargin).head()
    val discArea = 0.5 * 32 * 4.0 * math.sin(2 * math.Pi / 32)
    assert(math.abs(area.getDouble(0) - math.rint(discArea * 1e4) / 1e4) < 1e-9)
    assert(area.getBoolean(1))              // closed-interval touch
    assert(area.getDouble(2) == 2.0)        // 1x2 overlap
    assert(area.getDouble(3) == 2.0)        // the other half of the 2x2 box
    assert(area.getDouble(4) == 2.0)        // traced form agrees
    assert(area.getDouble(5) == 4.0)        // (4-2)² inner box
  }

  test("overlayDifference: subtracts every intersecting cell, passes " +
    "non-intersecting footprints through verbatim") {
    val bigs = Seq(
      (1L, "POLYGON ((1.5 0.5, 2.5 0.5, 2.5 1.5, 1.5 1.5, 1.5 0.5))"), // straddles A|B
      (2L, "POLYGON ((0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))"), // inside A
      (3L, "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))"))           // nowhere
      .toDF("fid", "fp")
    val layer = Seq(("A", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
      ("B", "POLYGON ((2 0, 4 0, 4 1, 2 1, 2 0))")).toDF("name", "cell")
    val got = SpatialJoin.overlayDifference(bigs, layer, $"fid", $"fp", $"cell")
      .select("id", "diff_wkt", "diff_area")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    // footprint 1: cell A eats x<2, cell B eats y<1 of the x>2 half —
    // remaining is the (2,1)-(2.5,1.5) quarter = 0.25
    assert(math.abs(got(1L)._3 - 0.25) < 1e-9, got(1L).toString)
    // footprint 2 is swallowed whole
    assert(got(2L)._3 == 0.0 && got(2L)._2 == "MULTIPOLYGON EMPTY")
    // footprint 3 intersects nothing: verbatim pass-through, no re-trace
    assert(got(3L)._2 == "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))")
    assert(got(3L)._3 == 1.0)
  }

  test("overlay join: ratio filter keeps only meaningful overlaps") {
    val bigs = Seq(
      (1L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),      // inside cell A
      (2L, "POLYGON ((1.9 0, 2.9 0, 2.9 1, 1.9 1, 1.9 0))"), // straddles A|B
      (3L, "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))")) // nowhere
      .toDF("id", "fp")
    val layer = Seq(("A", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
      ("B", "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")).toDF("name", "cell")
    // id2∩A is 0.1 wide -> ratio_big = 0.1: kept at 5%, dropped at 15%
    val at5 = SpatialJoin.overlayRatio(bigs, layer, $"fp", $"cell", 0.05)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(at5 == Set((1L, "A"), (2L, "A"), (2L, "B")))
    val at15 = SpatialJoin.overlayRatio(bigs, layer, $"fp", $"cell", 0.15)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(at15 == Set((1L, "A"), (2L, "B")))
  }
}
