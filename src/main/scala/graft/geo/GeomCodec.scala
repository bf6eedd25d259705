package graft.geo

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import Geometry._

/** Bit-exact binary codec for [[Geometry.Geom]] — the parse-once carrier
  * for the spatial join hot path.
  *
  * The reference's overlay loop re-parses each WKT string once per
  * candidate pair (ServiceAlertAugmenter.py:649-681 does it via shapely
  * object reuse; our previous UDF form genuinely re-parsed). At 100× the
  * per-pair text parse dominates the join, so geometries are now parsed
  * ONCE per row into this format before the join and the per-pair
  * predicates read it directly.
  *
  * Layout: a 32-byte bbox header (minx, miny, maxx, maxy as raw IEEE-754
  * doubles) followed by the recursive body. The header lets the join
  * predicate reject the (overwhelmingly common) disjoint pair with four
  * double reads and NO decode — the same test [[Geometry.intersects]] and
  * [[Geometry.intersectionArea]] start with, so short-circuiting on it is
  * observationally identical. Doubles round-trip through
  * `doubleToLongBits`, so decode(encode(g)) == g bit-for-bit and every
  * downstream measure (area, intersection, ratio) is unchanged to the last
  * ulp — the correctness gate's hash compare proves it.
  *
  * Decoding still allocates the `Geom` tree, so [[decodeCached]] memoizes
  * per thread behind a content-keyed LRU: in a broadcast nested-loop join
  * the stream row repeats across the inner loop and the (tiny) broadcast
  * layer cycles every outer step, so a few hundred entries turn per-PAIR
  * decodes into per-DISTINCT-GEOMETRY decodes. Thread-local, bounded, and
  * content-keyed (`ByteBuffer` equality) — safe under task concurrency and
  * speculative re-execution.
  */
object GeomCodec {

  private val TPoint = 1; private val TLine = 2; private val TPolygon = 3
  private val TMulti = 4; private val TCollection = 5

  def encode(g: Geom): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = new DataOutputStream(bos)
    val (lo, hi) = bbox(g)
    out.writeDouble(lo.x); out.writeDouble(lo.y)
    out.writeDouble(hi.x); out.writeDouble(hi.y)
    writeBody(out, g)
    out.flush()
    bos.toByteArray
  }

  private def writeRing(out: DataOutputStream, pts: IndexedSeq[Pt]): Unit = {
    out.writeInt(pts.length)
    var i = 0
    while (i < pts.length) {
      out.writeDouble(pts(i).x); out.writeDouble(pts(i).y); i += 1
    }
  }

  private def writePoly(out: DataOutputStream, p: GPolygon): Unit = {
    out.writeInt(1 + p.holes.length)
    writeRing(out, p.ring)
    p.holes.foreach(h => writeRing(out, h))
  }

  private def writeBody(out: DataOutputStream, g: Geom): Unit = g match {
    case GPoint(p) =>
      out.writeByte(TPoint); out.writeDouble(p.x); out.writeDouble(p.y)
    case GLine(pts) =>
      out.writeByte(TLine); writeRing(out, pts)
    case p: GPolygon =>
      out.writeByte(TPolygon); writePoly(out, p)
    case GMulti(ps) =>
      out.writeByte(TMulti); out.writeInt(ps.length)
      ps.foreach(p => writePoly(out, p))
    case GCollection(gs) =>
      out.writeByte(TCollection); out.writeInt(gs.length)
      gs.foreach(x => writeBody(out, x))
  }

  def decode(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    buf.position(32) // skip bbox header
    readBody(buf)
  }

  private def readRing(buf: ByteBuffer): IndexedSeq[Pt] = {
    val n = buf.getInt
    val b = Vector.newBuilder[Pt]; b.sizeHint(n)
    var i = 0
    while (i < n) { b += Pt(buf.getDouble, buf.getDouble); i += 1 }
    b.result()
  }

  private def readPoly(buf: ByteBuffer): GPolygon = {
    val nRings = buf.getInt
    val ring = readRing(buf)
    val holes = Vector.newBuilder[IndexedSeq[Pt]]; holes.sizeHint(nRings - 1)
    var i = 1
    while (i < nRings) { holes += readRing(buf); i += 1 }
    GPolygon(ring, holes.result())
  }

  private def readBody(buf: ByteBuffer): Geom = buf.get.toInt match {
    case TPoint => GPoint(Pt(buf.getDouble, buf.getDouble))
    case TLine  => GLine(readRing(buf))
    case TPolygon => readPoly(buf)
    case TMulti =>
      val n = buf.getInt
      GMulti((0 until n).map(_ => readPoly(buf)).toVector)
    case TCollection =>
      val n = buf.getInt
      GCollection((0 until n).map(_ => readBody(buf)).toVector)
    case t => throw new IllegalArgumentException(s"GeomCodec: bad tag $t")
  }

  /** Closed-interval bbox overlap read straight off the two headers —
    * byte-for-byte the same test as [[Geometry]]'s internal `bboxOverlap`
    * on the decoded values, so using it to short-circuit a predicate never
    * changes the answer. */
  def headerOverlap(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ab = ByteBuffer.wrap(a); val bb = ByteBuffer.wrap(b)
    val aMinX = ab.getDouble(0); val aMinY = ab.getDouble(8)
    val aMaxX = ab.getDouble(16); val aMaxY = ab.getDouble(24)
    val bMinX = bb.getDouble(0); val bMinY = bb.getDouble(8)
    val bMaxX = bb.getDouble(16); val bMaxY = bb.getDouble(24)
    aMinX <= bMaxX && bMinX <= aMaxX && aMinY <= bMaxY && bMinY <= aMaxY
  }

  private val CacheCap = 1024

  private val cache = ThreadLocal.withInitial[
      java.util.LinkedHashMap[ByteBuffer, Geom]](() =>
    new java.util.LinkedHashMap[ByteBuffer, Geom](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[ByteBuffer, Geom]): Boolean =
        size() > CacheCap
    })

  /** Decode with a per-thread content-keyed LRU (see class doc). The hash
    * walk over the bytes is ~10× cheaper than re-allocating the `Geom`
    * tree, and a hit costs only that walk. */
  def decodeCached(bytes: Array[Byte]): Geom = {
    val key = ByteBuffer.wrap(bytes)
    val m = cache.get()
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val g = decode(bytes)
      m.put(key, g)
      g
    }
  }
}
