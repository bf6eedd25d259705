package graft.geo

/** Minimal pure-Scala planar geometry kernel.
  *
  * No JTS/Sedona is resolvable in this environment (offline build), so the
  * engine carries its own kernel scoped to exactly the predicates/measures
  * the reference uses (SURVEY.md §2.4 Ops 33-35, 38, 56-58): WKT codec with
  * 6-dp output quantisation (matching the reference's
  * `rounding_precision=6`, ServiceAlertAugmenter.py:774), shoelace area,
  * point-in-polygon (hole-aware), segment intersection, polygon clipping,
  * envelope buffering, and polygon union.
  *
  * Boolean measures/union come from an exact vertical-slab sweep over the
  * full segment arrangement (see "arrangement sweep" below): union area,
  * intersection area for ARBITRARY (non-convex, holed, multi) polygons, and
  * a true dissolved union — the `shapely.unary_union` analogue the
  * reference applies to suburb/street footprints
  * (ServiceAlertAugmenter.py:759-765) — including hole creation and
  * point/line passthrough. Sutherland–Hodgman clipping is kept as a fast
  * path when the clip ring is convex (grid/suburb cells).
  *
  * Coordinates are (x=lon, y=lat) doubles; rings are closed (first==last
  * point accepted either way, stored open).
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  sealed trait Geom
  final case class GPoint(p: Pt) extends Geom
  final case class GLine(pts: IndexedSeq[Pt]) extends Geom
  /** Outer ring plus optional holes, stored without the closing duplicate
    * point. Hole boundaries belong to the polygon (closed set semantics). */
  final case class GPolygon(ring: IndexedSeq[Pt],
                            holes: IndexedSeq[IndexedSeq[Pt]] = Vector.empty) extends Geom
  final case class GMulti(polys: IndexedSeq[GPolygon]) extends Geom
  /** Mixed-dimension result (dissolved union with point/line parts). */
  final case class GCollection(geoms: IndexedSeq[Geom]) extends Geom

  // ---- WKT codec ----

  private def fmt(d: Double): String = {
    // 6-dp quantisation, no trailing zeros, no scientific notation
    val r = math.rint(d * 1e6) / 1e6
    if (r == math.rint(r)) r.toLong.toString
    else BigDecimal(r).underlying().stripTrailingZeros().toPlainString
  }

  private def ptsWkt(pts: Seq[Pt]): String = {
    val closed = if (pts.nonEmpty && pts.head != pts.last) pts :+ pts.head else pts
    closed.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString("(", ", ", ")")
  }

  private def polyBody(p: GPolygon): String =
    (p.ring +: p.holes).map(ptsWkt).mkString("(", ", ", ")")

  def toWkt(g: Geom): String = g match {
    case GPoint(p)   => s"POINT (${fmt(p.x)} ${fmt(p.y)})"
    case GLine(pts)  => "LINESTRING " +
      pts.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString("(", ", ", ")")
    case p: GPolygon => "POLYGON " + polyBody(p)
    case GMulti(ps)  =>
      if (ps.isEmpty) "MULTIPOLYGON EMPTY"
      else "MULTIPOLYGON " + ps.map(polyBody).mkString("(", ", ", ")")
    case GCollection(gs) =>
      if (gs.isEmpty) "GEOMETRYCOLLECTION EMPTY"
      else "GEOMETRYCOLLECTION " + gs.map(toWkt).mkString("(", ", ", ")")
  }

  /** Split a WKT body on commas at paren-depth 0. */
  private def splitTop(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def innerBody(s: String): String =
    s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))

  def parseWkt(wkt: String): Option[Geom] = {
    if (wkt == null) return None
    val s = wkt.trim
    def nums(body: String): IndexedSeq[Pt] =
      body.split(",").toIndexedSeq.map { pair =>
        val xs = pair.trim.split("\\s+")
        Pt(xs(0).toDouble, xs(1).toDouble)
      }
    def dropClose(pts: IndexedSeq[Pt]): IndexedSeq[Pt] =
      if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    def ring(group: String): IndexedSeq[Pt] = dropClose(nums(innerBody(group)))
    def poly(body: String): GPolygon = {
      val rings = splitTop(body).map(ring)
      GPolygon(rings.head, rings.tail.filter(_.length >= 3))
    }
    try {
      val upper = s.toUpperCase
      if (upper.startsWith("POINT")) {
        Some(GPoint(nums(innerBody(s)).head))
      } else if (upper.startsWith("LINESTRING")) {
        Some(GLine(nums(innerBody(s))))
      } else if (upper.startsWith("MULTIPOLYGON")) {
        if (upper.contains("EMPTY")) return Some(GMulti(Vector.empty))
        Some(GMulti(splitTop(innerBody(s)).map(g => poly(innerBody(g)))))
      } else if (upper.startsWith("POLYGON")) {
        Some(poly(innerBody(s)))
      } else if (upper.startsWith("GEOMETRYCOLLECTION")) {
        if (upper.contains("EMPTY")) return Some(GCollection(Vector.empty))
        val parts = splitTop(innerBody(s)).flatMap(parseWkt)
        Some(GCollection(parts))
      } else None
    } catch { case _: Exception => None }
  }

  // ---- measures ----

  /** Shoelace area (absolute). */
  def ringArea(ring: IndexedSeq[Pt]): Double = math.abs(signedArea(ring))

  def area(g: Geom): Double = g match {
    case GPolygon(r, hs) => math.max(ringArea(r) - hs.map(ringArea).sum, 0.0)
    case GMulti(ps)      => ps.map(area).sum
    case GCollection(gs) => gs.map(area).sum
    case _               => 0.0
  }

  def bbox(g: Geom): (Pt, Pt) = {
    val pts = g match {
      case GPoint(p)       => Seq(p)
      case GLine(ps)       => ps
      case GPolygon(r, _)  => r // holes are interior to the ring
      case GMulti(ps)      => ps.flatMap(_.ring)
      case GCollection(gs) => gs.flatMap(x => { val (lo, hi) = bbox(x); Seq(lo, hi) })
    }
    if (pts.isEmpty) (Pt(0, 0), Pt(0, 0))
    else (Pt(pts.map(_.x).min, pts.map(_.y).min), Pt(pts.map(_.x).max, pts.map(_.y).max))
  }

  private def bboxOverlap(a: Geom, b: Geom): Boolean = {
    val (alo, ahi) = bbox(a); val (blo, bhi) = bbox(b)
    alo.x <= bhi.x && blo.x <= ahi.x && alo.y <= bhi.y && blo.y <= ahi.y
  }

  // ---- predicates ----

  def pointInRing(p: Pt, ring: IndexedSeq[Pt]): Boolean = {
    // ray casting; boundary points count as inside (sufficient for overlay)
    var inside = false
    val n = ring.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val a = ring(i); val b = ring(j)
      if (onSegment(p, a, b)) return true
      if ((a.y > p.y) != (b.y > p.y) &&
        p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x) inside = !inside
      j = i; i += 1
    }
    inside
  }

  private def onRingBoundary(p: Pt, ring: IndexedSeq[Pt]): Boolean =
    segs(ring, closed = true).exists { case (a, b) => onSegment(p, a, b) }

  /** Strictly interior to the ring (boundary excluded). */
  private def inRingStrict(p: Pt, ring: IndexedSeq[Pt]): Boolean =
    !onRingBoundary(p, ring) && pointInRing(p, ring)

  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean = {
    val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    if (math.abs(cross) > 1e-12) return false
    p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
      p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
  }

  def segmentsIntersect(p1: Pt, p2: Pt, p3: Pt, p4: Pt): Boolean = {
    def d(a: Pt, b: Pt, c: Pt) = (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    val d1 = d(p3, p4, p1); val d2 = d(p3, p4, p2)
    val d3 = d(p1, p2, p3); val d4 = d(p1, p2, p4)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    onSegment(p1, p3, p4) || onSegment(p2, p3, p4) ||
      onSegment(p3, p1, p2) || onSegment(p4, p1, p2)
  }

  private def segs(pts: IndexedSeq[Pt], closed: Boolean): Seq[(Pt, Pt)] = {
    val base = pts.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
    if (closed && pts.length > 2) base :+ (pts.last, pts.head) else base
  }

  private def allRings(p: GPolygon): Seq[IndexedSeq[Pt]] = p.ring +: p.holes

  private def ringsCross(r1: IndexedSeq[Pt], r2: IndexedSeq[Pt]): Boolean =
    segs(r1, closed = true).exists { case (s1, s2) =>
      segs(r2, closed = true).exists { case (t1, t2) =>
        segmentsIntersect(s1, s2, t1, t2) } }

  def intersects(a: Geom, b: Geom): Boolean = {
    if (!bboxOverlap(a, b)) return false
    (a, b) match {
      case (GPoint(p), g)           => covers(g, p)
      case (g, GPoint(p))           => covers(g, p)
      case (GCollection(gs), g)     => gs.exists(x => intersects(x, g))
      case (g, GCollection(gs))     => gs.exists(x => intersects(g, x))
      case (GMulti(ps), g)          => ps.exists(p => intersects(p, g))
      case (g, GMulti(ps))          => ps.exists(p => intersects(g, p))
      case (GLine(l), p: GPolygon)  => lineMeetsPolygon(l, p)
      case (p: GPolygon, GLine(l))  => lineMeetsPolygon(l, p)
      case (GLine(l1), GLine(l2))   =>
        segs(l1, closed = false).exists { case (s1, s2) =>
          segs(l2, closed = false).exists { case (t1, t2) =>
            segmentsIntersect(s1, s2, t1, t2) } }
      case (pa: GPolygon, pb: GPolygon) =>
        // vertex containment (hole-aware) either way, or any ring crossing
        (pa.ring ++ pa.holes.flatten).exists(p => covers(pb, p)) ||
          (pb.ring ++ pb.holes.flatten).exists(p => covers(pa, p)) ||
          allRings(pa).exists(ra => allRings(pb).exists(rb => ringsCross(ra, rb)))
    }
  }

  private def lineMeetsPolygon(l: IndexedSeq[Pt], p: GPolygon): Boolean =
    l.exists(pt => covers(p, pt)) ||
      allRings(p).exists(r => segs(l, closed = false).exists { case (s1, s2) =>
        segs(r, closed = true).exists { case (t1, t2) =>
          segmentsIntersect(s1, s2, t1, t2) } })

  private def covers(g: Geom, p: Pt): Boolean = g match {
    case GPoint(q)       => math.abs(q.x - p.x) < 1e-12 && math.abs(q.y - p.y) < 1e-12
    case GLine(l)        => segs(l, closed = false).exists { case (a, b) => onSegment(p, a, b) }
    case GPolygon(r, hs) => pointInRing(p, r) && !hs.exists(h => inRingStrict(p, h))
    case GMulti(ps)      => ps.exists(poly => covers(poly, p))
    case GCollection(gs) => gs.exists(g2 => covers(g2, p))
  }

  // ---- intersection ----

  /** Sutherland–Hodgman clip (clip ring must be CONVEX). */
  def clipPolygon(subject: IndexedSeq[Pt], clip: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    // orient clip counter-clockwise so "inside" is consistently left-of-edge
    val c = if (signedArea(clip) < 0) clip.reverse else clip
    var out = subject
    val n = c.length
    var i = 0
    while (i < n && out.nonEmpty) {
      val a = c(i); val b = c((i + 1) % n)
      val in = out
      out = Vector.empty[Pt] ++ {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Pt]
        var j = 0
        val m = in.length
        while (j < m) {
          val cur = in(j); val prev = in((j + m - 1) % m)
          val curIn = side(a, b, cur) >= 0
          val prevIn = side(a, b, prev) >= 0
          if (curIn) {
            if (!prevIn) buf += lineIntersect(prev, cur, a, b)
            buf += cur
          } else if (prevIn) buf += lineIntersect(prev, cur, a, b)
          j += 1
        }
        buf
      }
      i += 1
    }
    out
  }

  private def signedArea(ring: IndexedSeq[Pt]): Double = {
    var s = 0.0
    val n = ring.length
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      s += a.x * b.y - b.x * a.y
      i += 1
    }
    s / 2.0
  }

  private def side(a: Pt, b: Pt, p: Pt): Double =
    (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)

  private def lineIntersect(p1: Pt, p2: Pt, a: Pt, b: Pt): Pt = {
    val a1 = p2.y - p1.y; val b1 = p1.x - p2.x
    val c1 = a1 * p1.x + b1 * p1.y
    val a2 = b.y - a.y; val b2 = a.x - b.x
    val c2 = a2 * a.x + b2 * a.y
    val det = a1 * b2 - a2 * b1
    if (math.abs(det) < 1e-18) p2
    else Pt((b2 * c1 - b1 * c2) / det, (a1 * c2 - a2 * c1) / det)
  }

  private def convexRing(r: IndexedSeq[Pt]): Boolean = {
    val n = r.length
    if (n < 3) return false
    var sign = 0
    var i = 0
    while (i < n) {
      val a = r(i); val b = r((i + 1) % n); val c = r((i + 2) % n)
      val cr = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
      if (math.abs(cr) > 1e-15) {
        val s = if (cr > 0) 1 else -1
        if (sign == 0) sign = s else if (sign != s) return false
      }
      i += 1
    }
    true
  }

  /** Area of a ∩ b, exact for arbitrary polygons. Convex single-ring `b`
    * (or `a`) takes the O(n) Sutherland–Hodgman path; everything else goes
    * through the exact arrangement sweep. */
  def intersectionArea(a: Geom, b: Geom): Double = {
    if (!bboxOverlap(a, b)) return 0.0
    (a, b) match {
      case (_, GPolygon(r2, hs)) if hs.isEmpty && convexRing(r2) => shClipArea(a, r2)
      case (GPolygon(r1, hs), _) if hs.isEmpty && convexRing(r1) => shClipArea(b, r1)
      case _ => intersectionAreaExact(a, b)
    }
  }

  private def shClipArea(subject: Geom, convexClip: IndexedSeq[Pt]): Double =
    subject match {
      case GPolygon(r, hs) =>
        math.max(ringArea(clipPolygon(r, convexClip)) -
          hs.map(h => ringArea(clipPolygon(h, convexClip))).sum, 0.0)
      case GMulti(ps)      => ps.map(p => shClipArea(p, convexClip)).sum
      case GCollection(gs) => gs.map(g => shClipArea(g, convexClip)).sum
      case _               => 0.0
    }

  // ================= exact arrangement sweep =================
  //
  // Vertical slab decomposition over the full segment arrangement of a set
  // of polygon "units" (one outer ring + holes each). Slab boundaries are
  // every vertex x, every vertical-edge x, and every pairwise crossing x —
  // so inside a slab no two edges cross and every edge present spans the
  // slab. Per slab, a unit's coverage is the even-odd pairing of its
  // spanning edges ordered at the slab midline; a region predicate over
  // per-side coverage counts then yields merged trapezoid runs. Exact (up
  // to float rounding) for area; the region BOUNDARY is recovered by
  // stitching trapezoid edges — slab-cut points are collinear on original
  // segments and removed by simplification, so the traced rings are the
  // true dissolved boundary (with holes).

  private final case class SEdge(ax: Double, ay: Double, bx: Double, by: Double) {
    def yAt(x: Double): Double =
      if (x <= ax) ay else if (x >= bx) by
      else ay + (by - ay) * ((x - ax) / (bx - ax))
  }

  private final case class SweepUnit(side: Int, edges: Array[SEdge],
                                     verticalXs: Array[Double])

  /** Ring sets (outer + holes) of every polygon part; each is one unit. */
  private def ringSetsOf(g: Geom): Seq[Seq[IndexedSeq[Pt]]] = g match {
    case GPolygon(r, hs) => if (r.length >= 3) Seq(r +: hs) else Seq.empty
    case GMulti(ps)      => ps.flatMap(ringSetsOf)
    case GCollection(gs) => gs.flatMap(ringSetsOf)
    case _               => Seq.empty
  }

  private def mkUnit(side: Int, rings: Seq[IndexedSeq[Pt]]): SweepUnit = {
    val es = Array.newBuilder[SEdge]
    val vx = Array.newBuilder[Double]
    rings.foreach { ring =>
      val n = ring.length
      var i = 0
      while (i < n) {
        val p = ring(i); val q = ring((i + 1) % n)
        if (p.x == q.x) { if (p.y != q.y) vx += p.x }
        else if (p.x < q.x) es += SEdge(p.x, p.y, q.x, q.y)
        else es += SEdge(q.x, q.y, p.x, p.y)
        i += 1
      }
    }
    SweepUnit(side, es.result(), vx.result())
  }

  private def slabBoundaries(units: Seq[SweepUnit]): Array[Double] = {
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    units.foreach { u =>
      xs ++= u.verticalXs
      u.edges.foreach { e => xs += e.ax; xs += e.bx }
    }
    // pairwise crossing x's (support-line solve, restricted to the shared
    // open x-range). O(S²) — the kernel runs on layer-scale geometry.
    val all = units.iterator.flatMap(_.edges).toArray
    var i = 0
    while (i < all.length) {
      val e = all(i)
      val me = (e.by - e.ay) / (e.bx - e.ax)
      var j = i + 1
      while (j < all.length) {
        val f = all(j)
        val lo = math.max(e.ax, f.ax); val hi = math.min(e.bx, f.bx)
        if (lo < hi) {
          val mf = (f.by - f.ay) / (f.bx - f.ax)
          if (math.abs(me - mf) > 1e-15) {
            val x = ((f.ay - mf * f.ax) - (e.ay - me * e.ax)) / (me - mf)
            if (x > lo && x < hi) xs += x
          }
        }
        j += 1
      }
      i += 1
    }
    // cluster boundaries within 1e-12: hairline slabs from crossing-x
    // rounding would otherwise emit coincident opposite segments that
    // corrupt ring stitching (area impact of the merge is ~1e-12·height)
    val sorted = xs.toArray.sorted
    val out = Array.newBuilder[Double]
    var last = Double.NaN
    sorted.foreach { x =>
      if (last.isNaN || x - last > 1e-12) { out += x; last = x }
    }
    out.result()
  }

  /** One merged run of the predicate region in a slab, bounded below/above
    * by original segments. */
  private final case class Trap(eLo: SEdge, eHi: SEdge)

  private def slabRuns(units: Seq[SweepUnit], x0: Double, x1: Double,
                       pred: (Int, Int) => Boolean): Vector[Trap] = {
    val xm = x0 + (x1 - x0) / 2
    // events: (y@mid, 0=open/1=close, side, edge); opens sort before closes
    // at equal y so coincident shared boundaries dissolve instead of gapping
    val evs = scala.collection.mutable.ArrayBuffer.empty[(Double, Int, Int, SEdge)]
    units.foreach { u =>
      val span = u.edges.filter(e => e.ax < xm && xm < e.bx)
      val sorted = span.sortBy(_.yAt(xm))
      var k = 0
      while (k + 1 < sorted.length) {
        evs += ((sorted(k).yAt(xm), 0, u.side, sorted(k)))
        evs += ((sorted(k + 1).yAt(xm), 1, u.side, sorted(k + 1)))
        k += 2
      }
    }
    val sortedEvs = evs.sortBy(t => (t._1, t._2))
    var cntA = 0; var cntB = 0
    var active = false
    var runLo: SEdge = null
    val runs = Vector.newBuilder[Trap]
    sortedEvs.foreach { case (_, typ, sideId, edge) =>
      if (typ == 0) { if (sideId == 0) cntA += 1 else cntB += 1 }
      else { if (sideId == 0) cntA -= 1 else cntB -= 1 }
      val nowActive = pred(cntA, cntB)
      if (nowActive && !active) runLo = edge
      else if (!nowActive && active) runs += Trap(runLo, edge)
      active = nowActive
    }
    runs.result()
  }

  private def sweepArea(units: Seq[SweepUnit], pred: (Int, Int) => Boolean): Double = {
    if (units.forall(_.edges.isEmpty)) return 0.0
    val xs = slabBoundaries(units)
    var area = 0.0
    var k = 0
    while (k + 1 < xs.length) {
      val x0 = xs(k); val x1 = xs(k + 1)
      if (x1 > x0) slabRuns(units, x0, x1, pred).foreach { t =>
        val h0 = t.eHi.yAt(x0) - t.eLo.yAt(x0)
        val h1 = t.eHi.yAt(x1) - t.eLo.yAt(x1)
        area += (x1 - x0) * (h0 + h1) / 2
      }
      k += 1
    }
    area
  }

  /** Exact union area of arbitrary polygons — overlaps counted once. */
  def unionArea(gs: Seq[Geom]): Double =
    sweepArea(gs.flatMap(ringSetsOf).map(rs => mkUnit(0, rs)), (a, _) => a > 0)

  /** Exact a∩b area for arbitrary (non-convex/holed/multi) polygons. */
  def intersectionAreaExact(a: Geom, b: Geom): Double = {
    val ua = ringSetsOf(a).map(rs => mkUnit(0, rs))
    val ub = ringSetsOf(b).map(rs => mkUnit(1, rs))
    if (ua.isEmpty || ub.isEmpty) 0.0
    else sweepArea(ua ++ ub, (x, y) => x > 0 && y > 0)
  }

  /** Exact area of a \ b for arbitrary polygons. */
  def differenceArea(a: Geom, b: Geom): Double = {
    val ua = ringSetsOf(a).map(rs => mkUnit(0, rs))
    if (ua.isEmpty) return 0.0
    val ub = ringSetsOf(b).map(rs => mkUnit(1, rs))
    sweepArea(ua ++ ub, (x, y) => x > 0 && y == 0)
  }

  /** Dissolved difference a \ b (geopandas `overlay(how="difference")` /
    * shapely `difference` analogue): the region covered by a's polygonal
    * parts and by none of b's, traced with holes — subtracting a polygon
    * strictly inside `a` creates a hole; subtracting a band through it
    * splits it into a MULTIPOLYGON. Same arrangement sweep as
    * [[unionDissolve]], different region predicate. Point/line parts of
    * either input are ignored (they carry no area to subtract from or
    * with). */
  def difference(a: Geom, b: Geom): Geom = {
    val ua = ringSetsOf(a).map(rs => mkUnit(0, rs))
    if (ua.isEmpty || ua.forall(_.edges.isEmpty)) return GMulti(Vector.empty)
    val ub = ringSetsOf(b).map(rs => mkUnit(1, rs))
    val parts = stitchRegion(ua ++ ub, (x, y) => x > 0 && y == 0)
    val sortedParts = parts.sortBy(p => (bbox(p)._1.x, bbox(p)._1.y, -area(p)))
    if (sortedParts.isEmpty) GMulti(Vector.empty)
    else if (sortedParts.length == 1) sortedParts.head
    else GMulti(sortedParts)
  }

  // ---- dissolved union geometry (trapezoid stitching) ----

  /** True dissolved union (`shapely.unary_union` analogue): overlapping
    * polygons merge into one boundary, shared edges vanish, enclosed voids
    * become holes. Point/line inputs pass through (deduplicated; points and
    * lines swallowed by a polygon are dropped). Returns GPolygon /
    * GMulti / GCollection depending on what survives. */
  def unionDissolve(gs: Seq[Geom]): Geom = {
    val units = gs.flatMap(ringSetsOf).map(rs => mkUnit(0, rs))
    val parts: IndexedSeq[GPolygon] =
      if (units.isEmpty || units.forall(_.edges.isEmpty)) Vector.empty
      else stitchRegion(units, (a, _) => a > 0)
    val sortedParts = parts.sortBy(p => (bbox(p)._1.x, bbox(p)._1.y, -area(p)))
    val extras = gs.flatMap(flattenNonArea).distinct.filterNot {
      case GPoint(p)  => sortedParts.exists(poly => covers(poly, p))
      case GLine(pts) =>
        // vertex+midpoint sample containment as the "swallowed" proxy
        val samples = pts ++ segs(pts, closed = false).map { case (a, b) =>
          Pt((a.x + b.x) / 2, (a.y + b.y) / 2) }
        samples.nonEmpty && samples.forall(p => sortedParts.exists(covers(_, p)))
      case _ => false
    }.sortBy(toWkt)
    if (extras.isEmpty) {
      if (sortedParts.isEmpty) GMulti(Vector.empty)
      else if (sortedParts.length == 1) sortedParts.head
      else GMulti(sortedParts)
    } else GCollection(sortedParts ++ extras)
  }

  private def flattenNonArea(g: Geom): Seq[Geom] = g match {
    case p: GPoint       => Seq(p)
    case l: GLine        => Seq(l)
    case GCollection(gs) => gs.flatMap(flattenNonArea)
    case _               => Seq.empty
  }

  /** Trace the boundary of an arbitrary coverage-predicate region of the
    * arrangement (union: `a > 0`; difference: `a > 0 && b == 0`; any other
    * boolean overlay works the same way) into simple rings with holes. */
  private def stitchRegion(units: Seq[SweepUnit],
                           pred: (Int, Int) => Boolean): IndexedSeq[GPolygon] = {
    val xs = slabBoundaries(units)
    if (xs.length < 2) return Vector.empty
    val slabs: Array[Vector[Trap]] = Array.tabulate(xs.length - 1) { k =>
      if (xs(k + 1) > xs(k)) slabRuns(units, xs(k), xs(k + 1), pred) else Vector.empty
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Pt, Pt)]
    // non-vertical boundary: bottom edges left→right, top edges right→left
    // (interior to the LEFT of travel — CCW outers, CW holes fall out)
    var k = 0
    while (k < slabs.length) {
      val x0 = xs(k); val x1 = xs(k + 1)
      slabs(k).foreach { t =>
        val bl = Pt(x0, t.eLo.yAt(x0)); val br = Pt(x1, t.eLo.yAt(x1))
        val tl = Pt(x0, t.eHi.yAt(x0)); val tr = Pt(x1, t.eHi.yAt(x1))
        // zero-height runs would emit coincident opposite segments that
        // derail the sharpest-left ring walk — they carry no boundary
        if (tl.y - bl.y > 1e-12 || tr.y - br.y > 1e-12) {
          out += ((bl, br))
          out += ((tr, tl))
        }
      }
      k += 1
    }
    // vertical boundary at each slab edge: symmetric difference of coverage
    // intervals approaching from the left slab vs the right slab
    def ivAt(runs: Vector[Trap], x: Double): Vector[(Double, Double)] = {
      val raw = runs.map(t => (t.eLo.yAt(x), t.eHi.yAt(x)))
        .filter(iv => iv._2 - iv._1 > 1e-12).sortBy(_._1)
      // runs can converge at the boundary; merge touching intervals
      raw.foldLeft(Vector.empty[(Double, Double)]) { (acc, iv) =>
        if (acc.nonEmpty && iv._1 <= acc.last._2 + 1e-12)
          acc.init :+ ((acc.last._1, math.max(acc.last._2, iv._2)))
        else acc :+ iv
      }
    }
    var b = 0
    while (b < xs.length) {
      val x = xs(b)
      val left = if (b == 0) Vector.empty else ivAt(slabs(b - 1), x)
      val right = if (b == xs.length - 1) Vector.empty else ivAt(slabs(b), x)
      // event sweep over both interval lists
      val evs = (left.flatMap(iv => Seq((iv._1, 1, 0), (iv._2, -1, 0))) ++
        right.flatMap(iv => Seq((iv._1, 0, 1), (iv._2, 0, -1)))).sortBy(_._1)
      var cl = 0; var cr = 0
      var idx = 0
      while (idx < evs.length) {
        val y0 = evs(idx)._1
        // apply all events at (numerically) this y
        while (idx < evs.length && evs(idx)._1 <= y0 + 1e-12) {
          cl += evs(idx)._2; cr += evs(idx)._3; idx += 1
        }
        if (idx < evs.length) {
          val y1 = evs(idx)._1
          if (y1 - y0 > 1e-12) {
            if (cl > 0 && cr == 0) out += ((Pt(x, y0), Pt(x, y1)))      // up
            else if (cr > 0 && cl == 0) out += ((Pt(x, y1), Pt(x, y0))) // down
          }
        }
      }
      b += 1
    }
    traceRings(out.toVector)
  }

  /** Stitch directed boundary segments (interior-left) into simple rings;
    * classify CCW rings as outers, CW as holes, and attach holes to their
    * smallest containing outer. */
  private def traceRings(segments: Vector[(Pt, Pt)]): IndexedSeq[GPolygon] = {
    def key(p: Pt): (Long, Long) = (math.round(p.x * 1e9), math.round(p.y * 1e9))
    val byStart = segments.indices.groupBy(i => key(segments(i)._1))
    val used = Array.fill(segments.length)(false)
    val rings = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Pt]]
    var s = 0
    while (s < segments.length) {
      if (!used(s)) {
        val startKey = key(segments(s)._1)
        val ring = scala.collection.mutable.ArrayBuffer[Pt](segments(s)._1)
        var cur = s
        var closed = false
        var guard = 0
        while (!closed && guard <= segments.length) {
          used(cur) = true
          val (a, bPt) = segments(cur)
          ring += bPt
          if (key(bPt) == startKey) closed = true
          else {
            val cands = byStart.getOrElse(key(bPt), Vector.empty).filterNot(used)
            if (cands.isEmpty) { guard = segments.length + 1 } // broken: bail
            else {
              // sharpest LEFT turn keeps rings simple at touch points
              val dx = bPt.x - a.x; val dy = bPt.y - a.y
              cur = cands.maxBy { j =>
                val (c1, c2) = segments(j)
                val ex = c2.x - c1.x; val ey = c2.y - c1.y
                math.atan2(dx * ey - dy * ex, dx * ex + dy * ey)
              }
            }
          }
          guard += 1
        }
        if (closed) {
          val cleaned = simplifyRing(ring.dropRight(1).toIndexedSeq)
          if (cleaned.length >= 3 && ringArea(cleaned) > 1e-18) rings += cleaned
        }
      }
      s += 1
    }
    val (outers, holes) = rings.partition(r => signedArea(r) > 0)
    val parts = outers.map(o => (o, scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Pt]]))
    holes.foreach { h =>
      val p = h.head
      val containing = parts.filter { case (o, _) => pointInRing(p, o) }
      if (containing.nonEmpty) containing.minBy { case (o, _) => ringArea(o) }._2 += h
    }
    parts.map { case (o, hs) => GPolygon(o, hs.toIndexedSeq) }.toIndexedSeq
  }

  /** Drop consecutive duplicate / collinear / spike vertices. */
  private def simplifyRing(ring: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    var cur = ring
    var changed = true
    while (changed && cur.length >= 3) {
      changed = false
      val n = cur.length
      val keep = Vector.newBuilder[Pt]
      var i = 0
      while (i < n) {
        val a = cur((i + n - 1) % n); val bPt = cur(i); val c = cur((i + 1) % n)
        val ux = bPt.x - a.x; val uy = bPt.y - a.y
        val vx = c.x - bPt.x; val vy = c.y - bPt.y
        val cross = ux * vy - uy * vx
        val lenProd = math.sqrt((ux * ux + uy * uy) * (vx * vx + vy * vy))
        val dup = math.abs(bPt.x - a.x) < 1e-12 && math.abs(bPt.y - a.y) < 1e-12
        val straight = lenProd > 0 && math.abs(cross) / lenProd < 1e-9
        if (dup || straight) changed = true else keep += bPt
        i += 1
      }
      cur = keep.result()
    }
    cur
  }

  // ---- construction ----

  def box(x0: Double, y0: Double, x1: Double, y1: Double): GPolygon =
    GPolygon(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1)))

  /** Envelope buffer: bbox expanded by d (the cheap approximation — the
    * reference buffers street segments by 1e-4 degrees, where an envelope
    * is within quantisation error of a true offset; [[buffer]] below is the
    * exact-edges form for any larger distance). */
  def bufferEnv(g: Geom, d: Double): GPolygon = {
    val (lo, hi) = bbox(g)
    box(lo.x - d, lo.y - d, hi.x + d, hi.y + d)
  }

  /** True buffer: for d > 0, the Minkowski sum of the geometry with a disc
    * of radius d, the disc discretised as a 4·quadSegs-gon (JTS's quadrant-
    * segments convention). Built as the dissolve-union of the geometry
    * itself, one rectangle swept along every edge, and one disc at every
    * vertex — the existing arrangement sweep does the dissolving, so round
    * joins, shared edges, and HOLE EROSION all fall out: a hole's boundary
    * rectangles eat d into the hole, and holes narrower than 2d close
    * entirely, exactly as a true buffer must.
    *
    * For d < 0, EROSION (the geopandas negative-buffer convention): the
    * result is the polygon minus the |d|-band around its own boundary —
    * `A ⊖ d = A \ dilate(∂A, |d|)`, computed with the same rect+disc band
    * and the exact [[difference]] sweep. Parts narrower than 2|d| vanish,
    * holes grow by |d|, and a dumbbell eroded past its neck splits into a
    * MULTIPOLYGON. Point/line inputs erode to empty (no interior). The disc
    * discretisation makes both directions conservative the same way JTS is:
    * inscribed 4·quadSegs-gons, error vanishing as quadSegs grows. */
  def buffer(g: Geom, d: Double, quadSegs: Int = 8): Geom = {
    if (d == 0) return g
    val r = math.abs(d)
    val n = math.max(4, 4 * quadSegs)
    def disc(c: Pt): GPolygon = GPolygon(
      (0 until n).map { i =>
        val a = 2 * math.Pi * i / n
        Pt(c.x + r * math.cos(a), c.y + r * math.sin(a))
      }.toVector)
    def rect(a: Pt, b: Pt): Option[GPolygon] = {
      val dx = b.x - a.x; val dy = b.y - a.y
      val len = math.hypot(dx, dy)
      if (len < 1e-12) None
      else {
        val ux = -dy / len * r; val uy = dx / len * r
        Some(GPolygon(Vector(Pt(a.x + ux, a.y + uy), Pt(b.x + ux, b.y + uy),
          Pt(b.x - ux, b.y - uy), Pt(a.x - ux, a.y - uy))))
      }
    }
    def ringParts(ring: IndexedSeq[Pt], closed: Boolean): Seq[Geom] = {
      val edges =
        if (closed) ring.indices.map(i => (ring(i), ring((i + 1) % ring.length)))
        else ring.indices.dropRight(1).map(i => (ring(i), ring(i + 1)))
      edges.flatMap { case (a, b) => rect(a, b) } ++ ring.map(disc)
    }
    if (d > 0) {
      def partsOf(g: Geom): Seq[Geom] = g match {
        case GPoint(p)       => Seq(disc(p))
        case GLine(pts)      => ringParts(pts, closed = false)
        case p: GPolygon     => p +: (p.ring +: p.holes).flatMap(r => ringParts(r, closed = true))
        case GMulti(ps)      => ps.flatMap(partsOf)
        case GCollection(gs) => gs.flatMap(partsOf)
      }
      unionDissolve(partsOf(g))
    } else {
      def boundaryBand(g: Geom): Seq[GPolygon] = g match {
        case p: GPolygon     =>
          (p.ring +: p.holes).flatMap(rg => ringParts(rg, closed = true))
            .collect { case poly: GPolygon => poly }
        case GMulti(ps)      => ps.flatMap(boundaryBand)
        case GCollection(gs) => gs.flatMap(boundaryBand)
        case _               => Seq.empty // points/lines have no interior
      }
      val band = boundaryBand(g)
      difference(g, GCollection(band.toIndexedSeq))
    }
  }

  /** Drop consecutive duplicate points; degenerate rings become empty. */
  def makeValid(g: Geom): Geom = g match {
    case GPolygon(r, hs) =>
      def dedup(ring: IndexedSeq[Pt]): IndexedSeq[Pt] =
        ring.foldLeft(Vector.empty[Pt])((acc, p) =>
          if (acc.nonEmpty && acc.last == p) acc else acc :+ p)
      val ring = dedup(r)
      GPolygon(if (ring.length >= 3) ring else Vector.empty,
        hs.map(dedup).filter(_.length >= 3))
    case other => other
  }

  /** Collection union: polygons gathered into one MULTIPOLYGON, parts NOT
    * dissolved — "sum of part areas" semantics (overlaps double-count).
    * Kept for sinks that want the raw part list; `unionDissolve` is the
    * measure-correct union. */
  def unionAll(gs: Seq[Geom]): Geom = {
    val polys = gs.flatMap {
      case p: GPolygon     => Seq(p)
      case GMulti(ps)      => ps
      case GCollection(cs) => cs.collect { case p: GPolygon => p }
      case _               => Seq.empty // zero-area parts dropped
    }
    GMulti(polys.toIndexedSeq)
  }
}
