package graft.geo

/** Minimal pure-Scala planar geometry kernel.
  *
  * No JTS/Sedona is resolvable in this environment (offline build), so the
  * engine carries its own kernel scoped to exactly the predicates/measures
  * the reference uses (SURVEY.md §2.4 Ops 33-35, 38, 56-58): WKT codec with
  * 6-dp output quantisation (matching the reference's
  * `rounding_precision=6`, ServiceAlertAugmenter.py:774), shoelace area,
  * point-in-polygon, segment intersection, Sutherland–Hodgman clipping for
  * intersection area (clip ring must be CONVEX — the reference's GIS layers
  * are grid/suburb cells; documented limitation), envelope buffering, and a
  * collection union.
  *
  * Coordinates are (x=lon, y=lat) doubles; rings are closed (first==last
  * point accepted either way, stored open).
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  sealed trait Geom
  final case class GPoint(p: Pt) extends Geom
  final case class GLine(pts: IndexedSeq[Pt]) extends Geom
  /** Single ring, no holes. Stored without the closing duplicate point. */
  final case class GPolygon(ring: IndexedSeq[Pt]) extends Geom
  final case class GMulti(polys: IndexedSeq[GPolygon]) extends Geom

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

  def toWkt(g: Geom): String = g match {
    case GPoint(p)   => s"POINT (${fmt(p.x)} ${fmt(p.y)})"
    case GLine(pts)  => "LINESTRING " +
      pts.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString("(", ", ", ")")
    case GPolygon(r) => s"POLYGON ${"(" + ptsWkt(r) + ")"}"
    case GMulti(ps)  =>
      if (ps.isEmpty) "MULTIPOLYGON EMPTY"
      else "MULTIPOLYGON " + ps.map(p => "(" + ptsWkt(p.ring) + ")").mkString("(", ", ", ")")
  }

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
    try {
      val upper = s.toUpperCase
      if (upper.startsWith("POINT")) {
        val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
        Some(GPoint(nums(body).head))
      } else if (upper.startsWith("LINESTRING")) {
        val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
        Some(GLine(nums(body)))
      } else if (upper.startsWith("POLYGON")) {
        val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')')).trim
        val ring = inner.substring(inner.indexOf('(') + 1, inner.indexOf(')'))
        Some(GPolygon(dropClose(nums(ring))))
      } else if (upper.startsWith("MULTIPOLYGON")) {
        if (upper.contains("EMPTY")) return Some(GMulti(Vector.empty))
        val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
        val rings = "\\(\\(([^)]*)\\)\\)".r.findAllMatchIn(inner).map(_.group(1))
        Some(GMulti(rings.map(r => GPolygon(dropClose(nums(r)))).toIndexedSeq))
      } else None
    } catch { case _: Exception => None }
  }

  // ---- measures ----

  /** Shoelace area (absolute). */
  def ringArea(ring: IndexedSeq[Pt]): Double = {
    if (ring.length < 3) return 0.0
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      s += a.x * b.y - b.x * a.y
      i += 1
    }
    math.abs(s) / 2.0
  }

  def area(g: Geom): Double = g match {
    case GPolygon(r) => ringArea(r)
    case GMulti(ps)  => ps.map(p => ringArea(p.ring)).sum
    case _           => 0.0
  }

  def bbox(g: Geom): (Pt, Pt) = {
    val pts = g match {
      case GPoint(p)   => Seq(p)
      case GLine(ps)   => ps
      case GPolygon(r) => r
      case GMulti(ps)  => ps.flatMap(_.ring)
    }
    (Pt(pts.map(_.x).min, pts.map(_.y).min), Pt(pts.map(_.x).max, pts.map(_.y).max))
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

  def intersects(a: Geom, b: Geom): Boolean = {
    if (!bboxOverlap(a, b)) return false
    (a, b) match {
      case (GPoint(p), g)           => covers(g, p)
      case (g, GPoint(p))           => covers(g, p)
      case (GMulti(ps), g)          => ps.exists(p => intersects(p, g))
      case (g, GMulti(ps))          => ps.exists(p => intersects(g, p))
      case (GLine(l), GPolygon(r))  => lineMeetsRing(l, r)
      case (GPolygon(r), GLine(l))  => lineMeetsRing(l, r)
      case (GLine(l1), GLine(l2))   =>
        segs(l1, closed = false).exists { case (s1, s2) =>
          segs(l2, closed = false).exists { case (t1, t2) =>
            segmentsIntersect(s1, s2, t1, t2) } }
      case (GPolygon(r1), GPolygon(r2)) =>
        r1.exists(p => pointInRing(p, r2)) || r2.exists(p => pointInRing(p, r1)) ||
          segs(r1, closed = true).exists { case (s1, s2) =>
            segs(r2, closed = true).exists { case (t1, t2) =>
              segmentsIntersect(s1, s2, t1, t2) } }
    }
  }

  private def lineMeetsRing(l: IndexedSeq[Pt], r: IndexedSeq[Pt]): Boolean =
    l.exists(p => pointInRing(p, r)) ||
      segs(l, closed = false).exists { case (s1, s2) =>
        segs(r, closed = true).exists { case (t1, t2) =>
          segmentsIntersect(s1, s2, t1, t2) } }

  private def covers(g: Geom, p: Pt): Boolean = g match {
    case GPoint(q)   => math.abs(q.x - p.x) < 1e-12 && math.abs(q.y - p.y) < 1e-12
    case GLine(l)    => segs(l, closed = false).exists { case (a, b) => onSegment(p, a, b) }
    case GPolygon(r) => pointInRing(p, r)
    case GMulti(ps)  => ps.exists(poly => pointInRing(p, poly.ring))
  }

  // ---- intersection (Sutherland–Hodgman; clip ring must be convex) ----

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

  /** Area of a ∩ b. `b` (or each part of it) must be convex. */
  def intersectionArea(a: Geom, b: Geom): Double = {
    if (!bboxOverlap(a, b)) return 0.0
    (a, b) match {
      case (GPolygon(r1), GPolygon(r2)) => ringArea(clipPolygon(r1, r2))
      case (GMulti(ps), g)              => ps.map(p => intersectionArea(p, g)).sum
      case (g, GMulti(ps))              => ps.map(p => intersectionArea(g, p)).sum
      case _                            => 0.0
    }
  }

  // ---- construction ----

  def box(x0: Double, y0: Double, x1: Double, y1: Double): GPolygon =
    GPolygon(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1)))

  /** Envelope buffer: bbox expanded by d (the engine's buffering
    * approximation — the reference buffers street segments by 1e-4 degrees,
    * where an envelope is within quantisation error of a true offset). */
  def bufferEnv(g: Geom, d: Double): GPolygon = {
    val (lo, hi) = bbox(g)
    box(lo.x - d, lo.y - d, hi.x + d, hi.y + d)
  }

  /** Drop consecutive duplicate points; degenerate rings become empty. */
  def makeValid(g: Geom): Geom = g match {
    case GPolygon(r) =>
      val dedup = r.foldLeft(Vector.empty[Pt])((acc, p) =>
        if (acc.nonEmpty && acc.last == p) acc else acc :+ p)
      GPolygon(if (dedup.length >= 3) dedup else Vector.empty)
    case other => other
  }

  /** Collection union: polygons gathered into one MULTIPOLYGON. Parts are
    * NOT dissolved — the measure contract is "sum of part areas", which
    * matches the reference's use (merging disjoint suburb/street footprints;
    * ServiceAlertAugmenter.py:759-765). Overlapping inputs double-count. */
  def unionAll(gs: Seq[Geom]): Geom = {
    val polys = gs.flatMap {
      case p: GPolygon  => Seq(p)
      case GMulti(ps)   => ps
      case GPoint(p)    => Seq.empty // zero-area parts dropped
      case GLine(_)     => Seq.empty
    }
    GMulti(polys.toIndexedSeq)
  }
}
