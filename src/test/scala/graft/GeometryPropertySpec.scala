package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geometry._

/** Property checks for the hand-written geometry kernel against independent
  * closed forms — deterministic seeded sampling (fixed seed, many cases)
  * rather than framework randomness, per the repo's reproducibility rule.
  * Pure kernel: no Spark session, so hundreds of cases cost milliseconds.
  */
class GeometryPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812)

  private def randBox(maxC: Int): (GPolygon, Int, Int, Int, Int) = {
    val x0 = rnd.nextInt(maxC); val y0 = rnd.nextInt(maxC)
    val w = 1 + rnd.nextInt(maxC / 2); val h = 1 + rnd.nextInt(maxC / 2)
    (box(x0, y0, x0 + w, y0 + h), x0, y0, x0 + w, y0 + h)
  }

  test("box intersection matches the closed form; intersects matches closed intervals") {
    for (_ <- 1 to 300) {
      val (a, ax0, ay0, ax1, ay1) = randBox(20)
      val (b, bx0, by0, bx1, by1) = randBox(20)
      val w = math.min(ax1, bx1) - math.max(ax0, bx0)
      val h = math.min(ay1, by1) - math.max(ay0, by0)
      val expected = math.max(w, 0).toDouble * math.max(h, 0).toDouble
      assert(math.abs(intersectionArea(a, b) - expected) < 1e-9,
        s"inter($ax0,$ay0,$ax1,$ay1 × $bx0,$by0,$bx1,$by1)")
      assert(intersects(a, b) == (w >= 0 && h >= 0))
      // symmetry + bound
      assert(math.abs(intersectionArea(a, b) - intersectionArea(b, a)) < 1e-9)
      assert(intersectionArea(a, b) <= math.min(area(a), area(b)) + 1e-9)
    }
  }

  test("dissolve union area equals exact unit-cell rasterisation for grid boxes") {
    for (_ <- 1 to 120) {
      val n = 2 + rnd.nextInt(6)
      val boxes = Seq.fill(n)(randBox(12))
      val gs = boxes.map(_._1)
      val covered = (for {
        (_, x0, y0, x1, y1) <- boxes
        ix <- x0 until x1
        iy <- y0 until y1
      } yield (ix, iy)).toSet
      val expected = covered.size.toDouble
      assert(math.abs(unionArea(gs) - expected) < 1e-9, s"boxes=$boxes")
      assert(math.abs(area(unionDissolve(gs)) - expected) < 1e-9)
      // bounds: at least the largest part, at most the sum
      assert(unionArea(gs) >= gs.map(area).max - 1e-9)
      assert(unionArea(gs) <= gs.map(area).sum + 1e-9)
    }
  }

  test("buffer of a box matches area + perimeter·d + disc; bounded by the envelope") {
    val n = 32
    for (_ <- 1 to 60) {
      val (g, x0, y0, x1, y1) = randBox(15)
      val d = 0.5 + rnd.nextInt(3)
      val discArea = 0.5 * n * d * d * math.sin(2 * math.Pi / n)
      val w = (x1 - x0).toDouble; val h = (y1 - y0).toDouble
      val expected = w * h + 2 * (w + h) * d + discArea
      val got = area(buffer(g, d))
      assert(math.abs(got - expected) < 1e-6, s"box($x0,$y0,$x1,$y1) d=$d")
      assert(got >= area(g))
      assert(got <= area(bufferEnv(g, d)) + 1e-9) // rounded corners < square
    }
  }

  test("WKT round-trips losslessly for 6-dp grid geometries") {
    for (_ <- 1 to 200) {
      val (g, _, _, _, _) = randBox(100)
      // shift onto the 0.1 grid to exercise fractional formatting
      val shifted = GPolygon(g.ring.map(p => Pt(p.x / 10.0, p.y / 10.0)))
      val back = parseWkt(toWkt(shifted))
      assert(back.contains(shifted), s"wkt=${toWkt(shifted)}")
      val multi = GMulti(Vector(shifted, g))
      assert(parseWkt(toWkt(multi)).contains(multi))
    }
  }

  test("difference area equals unit-cell rasterisation; trace agrees with sweep") {
    for (_ <- 1 to 120) {
      val (a, ax0, ay0, ax1, ay1) = randBox(12)
      val n = 1 + rnd.nextInt(4)
      val bs = Seq.fill(n)(randBox(12))
      val bMulti = GMulti(bs.map(_._1).toVector)
      val bCells = (for {
        (_, x0, y0, x1, y1) <- bs
        ix <- x0 until x1; iy <- y0 until y1
      } yield (ix, iy)).toSet
      val expected = (for {
        ix <- ax0 until ax1; iy <- ay0 until ay1
        if !bCells.contains((ix, iy))
      } yield 1).size.toDouble
      assert(math.abs(differenceArea(a, bMulti) - expected) < 1e-9,
        s"a=($ax0,$ay0,$ax1,$ay1) bs=$bs")
      // the traced geometry measures the same as the measure-only sweep
      assert(math.abs(area(difference(a, bMulti)) - expected) < 1e-9,
        s"trace: a=($ax0,$ay0,$ax1,$ay1) bs=$bs")
      // inclusion–exclusion vs the intersection kernel
      assert(math.abs(differenceArea(a, bMulti) +
        intersectionAreaExact(a, bMulti) - area(a)) < 1e-9)
    }
  }

  test("difference identities: self, disjoint, containment") {
    for (_ <- 1 to 80) {
      val (a, x0, y0, x1, y1) = randBox(15)
      assert(differenceArea(a, a) < 1e-9)
      assert(area(difference(a, a)) < 1e-9)
      val far = box(x1 + 1, y1 + 1, x1 + 2, y1 + 2)
      assert(math.abs(differenceArea(a, far) - area(a)) < 1e-9)
      val cover = box(x0 - 1, y0 - 1, x1 + 1, y1 + 1)
      assert(differenceArea(a, cover) < 1e-9)
    }
  }

  test("erosion of a box is the exact inner box; over-erosion vanishes") {
    for (_ <- 1 to 60) {
      val (g, x0, y0, x1, y1) = randBox(15)
      val w = (x1 - x0).toDouble; val h = (y1 - y0).toDouble
      val d = 0.25 + 0.25 * rnd.nextInt(3) // 0.25 / 0.5 / 0.75
      val expected = math.max(w - 2 * d, 0) * math.max(h - 2 * d, 0)
      val got = area(buffer(g, -d))
      assert(math.abs(got - expected) < 1e-6, s"box($x0,$y0,$x1,$y1) d=$d")
      // over-erode: any d ≥ min(w,h)/2 must vanish entirely
      val big = math.min(w, h) / 2 + 0.1
      assert(area(buffer(g, -big)) < 1e-9, s"box($x0,$y0,$x1,$y1) big=$big")
    }
  }

  test("difference + intersection partition the subject for slanted " +
    "triangles (trace agrees with sweep off the grid)") {
    def randTriangle(): GPolygon = {
      def pt() = Pt(rnd.nextDouble() * 10, rnd.nextDouble() * 10)
      var t = Vector(pt(), pt(), pt())
      while (ringArea(t) < 0.5) t = Vector(pt(), pt(), pt()) // non-degenerate
      GPolygon(t)
    }
    for (_ <- 1 to 120) {
      val a = randTriangle(); val b = randTriangle()
      // inclusion–exclusion: A\B and A∩B partition A (independent kernels:
      // the difference predicate vs the intersection predicate)
      val dSweep = differenceArea(a, b)
      assert(math.abs(dSweep + intersectionAreaExact(a, b) - area(a)) < 1e-9,
        s"a=${toWkt(a)} b=${toWkt(b)}")
      // the traced geometry measures what the measure-only sweep measures,
      // including slanted crossing vertices (not on any grid)
      assert(math.abs(area(difference(a, b)) - dSweep) < 1e-9,
        s"trace: a=${toWkt(a)} b=${toWkt(b)}")
      // erosion stays inside the original: (A ⊖ d) \ A is empty
      val er = buffer(a, -0.3)
      assert(differenceArea(er, a) < 1e-9, s"erode escaped: a=${toWkt(a)}")
      assert(area(er) <= area(a) + 1e-9)
    }
  }

  test("UnionAgg pre-dissolve compaction never changes the result") {
    // drive the Aggregator's reduce/merge/finish directly: a threshold of 2
    // trips compaction constantly; the result must equal the untripped
    // aggregator's and the direct kernel dissolve, for any batching
    import graft.geo.GeoFunctions.UnionAggBounded
    val tight = new UnionAggBounded(2)
    val loose = new UnionAggBounded(1000000)
    for (_ <- 1 to 60) {
      val n = 3 + rnd.nextInt(8)
      val wkts = Seq.fill(n)(randBox(12)._1).map(toWkt) ++
        Seq("POINT (50 50)", "LINESTRING (60 60, 61 61)") // pass-through parts
      // random split into merge batches
      val cut = 1 + rnd.nextInt(wkts.length - 1)
      val (b1, b2) = wkts.splitAt(cut)
      def run(agg: UnionAggBounded): String = agg.finish(agg.merge(
        b1.foldLeft(agg.zero)(agg.reduce), b2.foldLeft(agg.zero)(agg.reduce)))
      val got = run(tight)
      assert(got == run(loose), s"wkts=$wkts")
      assert(got == toWkt(unionDissolve(wkts.sorted.flatMap(parseWkt))))
      // compaction actually bounds the buffer
      assert(b1.foldLeft(tight.zero)(tight.reduce).length <= 3)
    }
  }

  test("intersection of nested and disjoint boxes: containment and zero cases") {
    for (_ <- 1 to 100) {
      val (outer, x0, y0, x1, y1) = randBox(20)
      if (x1 - x0 > 2 && y1 - y0 > 2) {
        val inner = box(x0 + 1, y0 + 1, x1 - 1, y1 - 1)
        assert(math.abs(intersectionArea(outer, inner) - area(inner)) < 1e-9)
        assert(intersects(outer, inner))
      }
      val far = box(x1 + 1, y1 + 1, x1 + 3, y1 + 3)
      assert(intersectionArea(outer, far) == 0.0)
      assert(!intersects(outer, far))
    }
  }
}
