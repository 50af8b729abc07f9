package graft.geo

/** Minimal WKT parser/printer — pure Scala, no external geo libs
  * (zero-egress build). Covers the geometry surface of the reference
  * (/root/reference/src/dso_import/batch/geo.py:52-78): parse, type
  * inspection, and the promote matrix Polygon→MultiPolygon,
  * LineString→MultiLineString, Point→MultiPoint; any other mismatch →
  * None (the reference nulls the geometry and drops the row).
  */
object GeoWkt {

  final case class Pt(x: Double, y: Double)

  sealed trait Geom {
    def typeName: String
    def nPoints: Int
    def toWkt: String
  }

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString
  private def fmtPt(p: Pt): String = s"${fmt(p.x)} ${fmt(p.y)}"
  private def ring(ps: Seq[Pt]): String = ps.map(fmtPt).mkString("(", ", ", ")")

  final case class Point(p: Pt) extends Geom {
    val typeName = "POINT"; def nPoints = 1
    def toWkt = s"POINT (${fmtPt(p)})"
  }
  final case class LineString(ps: Seq[Pt]) extends Geom {
    val typeName = "LINESTRING"; def nPoints = ps.size
    def toWkt = s"LINESTRING ${ring(ps)}"
  }
  final case class Polygon(rings: Seq[Seq[Pt]]) extends Geom {
    val typeName = "POLYGON"; def nPoints = rings.map(_.size).sum
    def toWkt = s"POLYGON ${rings.map(ring).mkString("(", ", ", ")")}"
  }
  final case class MultiPoint(ps: Seq[Pt]) extends Geom {
    val typeName = "MULTIPOINT"; def nPoints = ps.size
    def toWkt = s"MULTIPOINT ${ring(ps)}"
  }
  final case class MultiLineString(ls: Seq[Seq[Pt]]) extends Geom {
    val typeName = "MULTILINESTRING"; def nPoints = ls.map(_.size).sum
    def toWkt = s"MULTILINESTRING ${ls.map(ring).mkString("(", ", ", ")")}"
  }
  final case class MultiPolygon(polys: Seq[Seq[Seq[Pt]]]) extends Geom {
    val typeName = "MULTIPOLYGON"; def nPoints = polys.flatMap(_.map(_.size)).sum
    def toWkt = s"MULTIPOLYGON ${polys.map(p => p.map(ring).mkString("(", ", ", ")")).mkString("(", ", ", ")")}"
  }

  // ---- recursive-descent parser --------------------------------------

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def eof: Boolean = { ws(); i >= s.length }
    def word(): String = {
      ws(); val start = i
      while (i < s.length && s.charAt(i).isLetter) i += 1
      s.substring(start, i).toUpperCase
    }
    def expect(c: Char): Boolean = { ws(); if (i < s.length && s.charAt(i) == c) { i += 1; true } else false }
    def peek(c: Char): Boolean = { ws(); i < s.length && s.charAt(i) == c }
    def number(): Option[Double] = {
      ws(); val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
        ((s.charAt(i) == '-' || s.charAt(i) == '+') && i > start &&
          (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
      if (i == start) None
      else try Some(s.substring(start, i).toDouble) catch { case _: NumberFormatException => None }
    }
    def point(): Option[Pt] =
      for (x <- number(); y <- number()) yield Pt(x, y)
    def pointList(): Option[Seq[Pt]] = {
      if (!expect('(')) return None
      val buf = scala.collection.mutable.ArrayBuffer.empty[Pt]
      var ok = true
      var done = false
      while (ok && !done) {
        point() match {
          case Some(p) =>
            buf += p
            if (expect(',')) () else if (expect(')')) done = true else ok = false
          case None => ok = false
        }
      }
      if (ok && buf.nonEmpty) Some(buf.toSeq) else None
    }
    def listOf[A](inner: () => Option[A]): Option[Seq[A]] = {
      if (!expect('(')) return None
      val buf = scala.collection.mutable.ArrayBuffer.empty[A]
      var ok = true
      var done = false
      while (ok && !done) {
        inner() match {
          case Some(a) =>
            buf += a
            if (expect(',')) () else if (expect(')')) done = true else ok = false
          case None => ok = false
        }
      }
      if (ok && buf.nonEmpty) Some(buf.toSeq) else None
    }
  }

  /** EWKT `SRID=n;` prefix split: (declared srid, geometry body), or
    * None when the prefix is malformed (`SRID=` with no `;` or a
    * non-integer value). Case-insensitive, as GEOS accepts. */
  private def splitSrid(t: String): Option[(Option[Int], String)] =
    if (t.regionMatches(true, 0, "SRID=", 0, 5)) {
      val semi = t.indexOf(';')
      if (semi < 0) None
      else try Some((Some(t.substring(5, semi).trim.toInt), t.substring(semi + 1).trim))
      catch { case _: NumberFormatException => None }
    } else Some((None, t))

  /** Parse WKT or EWKT (`SRID=28992;POINT (1 2)`), keeping the declared
    * SRID. The reference's inputs go through Django's GEOSGeometry,
    * which accepts EWKT, and its schema pins the SRID as column-type
    * metadata — `geometry(MultiPolygon,28992)` (bagh_create.sql:37);
    * extraction here is the enforcement hook for that contract. */
  def parseEwkt(wkt: String): Option[(Option[Int], Geom)] = {
    if (wkt == null) return None
    val t = wkt.trim
    if (t.isEmpty) return None
    for ((srid, body) <- splitSrid(t); g <- parseBody(body)) yield (srid, g)
  }

  /** Parse WKT; None on any syntax error, empty input, or unsupported
    * type. An EWKT SRID prefix is accepted and stripped (toWkt prints
    * canonical WKT). Polygon rings are NOT validity-checked beyond
    * syntax (the reference delegates that to GEOS; closure is checked
    * by isValid). */
  def parse(wkt: String): Option[Geom] = parseEwkt(wkt).map(_._2)

  private def parseBody(t: String): Option[Geom] = {
    if (t.isEmpty) return None
    val p = new P(t)
    val g = p.word() match {
      case "POINT" =>
        if (p.expect('(')) for (pt <- p.point() if p.expect(')')) yield Point(pt)
        else None
      case "LINESTRING" => p.pointList().map(LineString)
      case "POLYGON" => p.listOf(() => p.pointList()).map(Polygon)
      case "MULTIPOINT" =>
        // both MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4))
        if (p.peek('(')) {
          val save = t
          p.listOf { () =>
            if (p.peek('(')) { if (p.expect('(')) for (pt <- p.point() if p.expect(')')) yield pt else None }
            else p.point()
          }.map(MultiPoint)
        } else None
      case "MULTILINESTRING" => p.listOf(() => p.pointList()).map(MultiLineString)
      case "MULTIPOLYGON" => p.listOf(() => p.listOf(() => p.pointList())).map(MultiPolygon)
      case _ => None
    }
    g.filter(_ => p.eof)
  }

  /** Promote/coerce to the target type (batch/geo.py:58-77): exact type
    * passes through; single→multi of the same family is wrapped; any
    * other combination → None. */
  def promote(g: Geom, target: String): Option[Geom] = (g, target.toUpperCase) match {
    case (g, t) if g.typeName == t => Some(g)
    case (Point(p), "MULTIPOINT") => Some(MultiPoint(Seq(p)))
    case (LineString(ps), "MULTILINESTRING") => Some(MultiLineString(Seq(ps)))
    case (Polygon(rs), "MULTIPOLYGON") => Some(MultiPolygon(Seq(rs)))
    case _ => None
  }

  /** Structural validity: polygon rings closed with ≥4 points,
    * linestrings ≥2 points. */
  def isValid(g: Geom): Boolean = g match {
    case Point(_) => true
    case MultiPoint(ps) => ps.nonEmpty
    case LineString(ps) => ps.size >= 2
    case MultiLineString(ls) => ls.nonEmpty && ls.forall(_.size >= 2)
    case Polygon(rs) => rs.nonEmpty && rs.forall(r => r.size >= 4 && r.head == r.last)
    case MultiPolygon(ps) =>
      ps.nonEmpty && ps.forall(rs => rs.nonEmpty && rs.forall(r => r.size >= 4 && r.head == r.last))
  }
}
