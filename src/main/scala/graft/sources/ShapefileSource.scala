package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession, functions}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.geo.GeoWkt

/** S4 shapefile scan — the reference shells out to GDAL
  * (/root/reference/src/dso_import/batch/geo.py:35-49: `process_shp`
  * iterates OGR features = geometry + attribute fields). A pure-Spark
  * build has no GDAL, so this is a from-scratch reader of the PUBLIC
  * ESRI Shapefile spec (the 1998 whitepaper): the `.shp` main file
  * (geometry records) and the sibling `.dbf` (dBase III attribute
  * table), decoded with a caller-chosen charset (the reference
  * defaults to ISO-8859-1).
  *
  * Output: one row per shapefile record —
  * `(path, record_number, geometry /*WKT*/, <one string column per
  * dbf field>)`. Attributes stay raw strings, like [[CsvSource]]'s
  * all-string reads: typed parsing belongs to the spec-driven
  * pipeline.
  *
  * Scale shape: `.shp` is a legacy non-splittable container (records
  * are back-to-back with no sync markers; splitting needs the `.shx`
  * index plus coordinated dbf offsets), so the unit of parallelism is
  * the FILE — each (shp, dbf) pair is one task via Spark's
  * `binaryFile` source, and a directory of extracts fans out across
  * executors. That is the honest optimum for this format: boundary
  * extracts are MB-scale, and a 100 TB corpus of them parallelizes by
  * count, not by split.
  *
  * Geometry support: Null, Point, MultiPoint, PolyLine, Polygon, and
  * their Z/M variants (XY read, Z/M tails ignored — record framing
  * comes from the record header, so trailing arrays skip for free).
  * Polygon ring grouping follows the spec: clockwise rings (shoelace
  * sign) are outers, counter-clockwise are holes, a hole attaches to
  * the first outer whose bbox contains its first vertex; one outer →
  * POLYGON, several → MULTIPOLYGON — matching what GDAL hands the
  * reference for district/neighbourhood boundary files.
  */
object ShapefileSource {

  /** One dBase III field descriptor. */
  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  // ---- .dbf (dBase III) ------------------------------------------------

  /** (numRecords, headerSize, recordSize, fields). */
  def parseDbfHeader(bytes: Array[Byte]): (Int, Int, Int, Seq[DbfField]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recordSize = bb.getShort(10) & 0xffff
    val fields = scala.collection.mutable.ArrayBuffer.empty[DbfField]
    var off = 32
    while (off + 32 <= headerSize && (bytes(off) & 0xff) != 0x0d) {
      var end = off
      while (end < off + 11 && bytes(end) != 0) end += 1
      val name = new String(bytes, off, end - off, "US-ASCII")
      fields += DbfField(name, (bytes(off + 11) & 0xff).toChar,
        bytes(off + 16) & 0xff, bytes(off + 17) & 0xff)
      off += 32
    }
    (numRecords, headerSize, recordSize, fields.toSeq)
  }

  /** All attribute records as trimmed strings (empty → null). Deleted
    * rows (flag 0x2A) are kept so record i still pairs with shp record
    * i — the alignment GDAL relies on; callers can filter. */
  def dbfRecords(bytes: Array[Byte], encoding: String): Seq[Seq[String]] = {
    val (numRecords, headerSize, recordSize, fields) = parseDbfHeader(bytes)
    (0 until numRecords).map { r =>
      val start = headerSize + r * recordSize
      var pos = start + 1 // deletion flag byte
      fields.map { f =>
        val raw = new String(bytes, pos, f.length, encoding).trim
        pos += f.length
        if (raw.isEmpty) null else raw
      }
    }
  }

  // ---- .shp geometry records -------------------------------------------

  /** Shoelace orientation: positive accumulated cross → clockwise in
    * screen coordinates = OUTER ring per the shapefile spec. */
  private def isClockwise(ring: Seq[GeoWkt.Pt]): Boolean = {
    var s = 0.0
    var i = 0
    while (i < ring.length - 1) {
      val a = ring(i); val b = ring(i + 1)
      s += (b.x - a.x) * (b.y + a.y)
      i += 1
    }
    s > 0
  }

  private def bboxContains(ring: Seq[GeoWkt.Pt], p: GeoWkt.Pt): Boolean = {
    var minX = Double.MaxValue; var maxX = Double.MinValue
    var minY = Double.MaxValue; var maxY = Double.MinValue
    ring.foreach { q =>
      if (q.x < minX) minX = q.x; if (q.x > maxX) maxX = q.x
      if (q.y < minY) minY = q.y; if (q.y > maxY) maxY = q.y
    }
    p.x >= minX && p.x <= maxX && p.y >= minY && p.y <= maxY
  }

  /** Group polygon-record rings into a POLYGON/MULTIPOLYGON. */
  private def groupRings(rings: Seq[Seq[GeoWkt.Pt]]): GeoWkt.Geom = {
    val (outers, holes) = rings.partition(isClockwise)
    if (outers.size <= 1) {
      // zero outers = degenerate file (all rings CCW): treat rings as-is
      val ordered = if (outers.isEmpty) rings else outers ++ holes
      GeoWkt.Polygon(ordered)
    } else {
      val polys = outers.map(o => scala.collection.mutable.ArrayBuffer(o))
      holes.foreach { h =>
        val host = polys.indexWhere(p => bboxContains(p.head, h.head))
        polys(if (host >= 0) host else 0) += h
      }
      GeoWkt.MultiPolygon(polys.map(_.toSeq))
    }
  }

  private def readPoints(bb: ByteBuffer, n: Int): IndexedSeq[GeoWkt.Pt] =
    (0 until n).map(_ => GeoWkt.Pt(bb.getDouble(), bb.getDouble()))

  /** Parse one record's content (after the 8-byte record header) into
    * a geometry; None for Null shapes and unsupported types. Z/M
    * variants read the XY block and ignore the tails. */
  private def parseShape(content: ByteBuffer): Option[GeoWkt.Geom] = {
    val shapeType = content.getInt()
    shapeType % 10 match { // 1/11/21 → point family, etc.
      case 0 => None
      case 1 => // Point
        Some(GeoWkt.Point(GeoWkt.Pt(content.getDouble(), content.getDouble())))
      case 8 => // MultiPoint: bbox(4d), numPoints, points
        content.position(content.position() + 32)
        val n = content.getInt()
        Some(GeoWkt.MultiPoint(readPoints(content, n)))
      case 3 | 5 => // PolyLine / Polygon: bbox, numParts, numPoints, parts, points
        content.position(content.position() + 32)
        val numParts = content.getInt()
        val numPoints = content.getInt()
        val parts = (0 until numParts).map(_ => content.getInt())
        val pts = readPoints(content, numPoints)
        val rings = parts.zipWithIndex.map { case (start, i) =>
          val end = if (i + 1 < numParts) parts(i + 1) else numPoints
          pts.slice(start, end)
        }.filter(_.nonEmpty)
        if (rings.isEmpty) None
        else if (shapeType % 10 == 3)
          Some(if (rings.size == 1) GeoWkt.LineString(rings.head)
          else GeoWkt.MultiLineString(rings))
        else Some(groupRings(rings))
      case _ => None
    }
  }

  /** Sequential record walk of a whole `.shp` payload:
    * (recordNumber, geometry). Record framing comes from each record
    * header's content length, so unsupported tails never desync. */
  def shpGeometries(bytes: Array[Byte]): Seq[(Int, Option[GeoWkt.Geom])] = {
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileLen = be.getInt(24) * 2 // 16-bit words → bytes
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Option[GeoWkt.Geom])]
    var off = 100
    while (off + 8 <= math.min(fileLen, bytes.length)) {
      val recNo = be.getInt(off)
      val contentBytes = be.getInt(off + 4) * 2
      val content = ByteBuffer.wrap(bytes, off + 8, contentBytes)
        .order(ByteOrder.LITTLE_ENDIAN)
      out += ((recNo, try parseShape(content) catch { case _: Exception => None }))
      off += 8 + contentBytes
    }
    out.toSeq
  }

  // ---- Spark entry ------------------------------------------------------

  private def basename(path: String): String = {
    val slash = path.lastIndexOf('/')
    val dot = path.lastIndexOf('.')
    path.substring(slash + 1, if (dot > slash) dot else path.length)
  }

  /** Read a `.shp` (or a directory/glob of them) with sibling `.dbf`
    * attributes. The attribute schema is derived from the dbf with the
    * lexicographically smallest path (deterministic; one small
    * driver-side job); every other dbf in the directory must declare
    * the same field list — a mismatch fails fast naming the offending
    * file, rather than emitting silently misaligned columns. Files
    * lacking a dbf yield null attributes. */
  def read(spark: SparkSession, path: String,
      encoding: String = "ISO-8859-1"): DataFrame = {
    import spark.implicits._
    val locs =
      if (path.toLowerCase.endsWith(".shp"))
        Seq(path, path.dropRight(4) + ".dbf", path.dropRight(4) + ".DBF")
      else Seq(s"$path/*.shp", s"$path/*.dbf")
    val existing = locs.filter { l =>
      // binaryFile throws on paths with zero matches; pre-filter
      val p = new org.apache.hadoop.fs.Path(l)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      try fs.globStatus(p) != null && fs.globStatus(p).nonEmpty
      catch { case _: Exception => false }
    }
    require(existing.nonEmpty, s"no shapefile at $path")
    val raw = spark.read.format("binaryFile").load(existing: _*)
      .select($"path", $"content").as[(String, Array[Byte])]

    // pick the schema dbf by smallest path — deterministic. min(path)
    // over the already-loaded listing is column-pruned (no content
    // read) and brings ONE row to the driver, not every path: a huge
    // glob stays off the driver heap. Only the chosen file's bytes
    // come back.
    val schemaDbfPath = Option(raw.toDF()
      .where(functions.lower($"path").endsWith(".dbf"))
      .agg(functions.min($"path")).head().getString(0))
    val firstDbf = schemaDbfPath.map(p0 =>
      raw.filter(_._1 == p0).map(_._2).take(1).head)
    val fields = firstDbf.map(parseDbfHeader(_)._4).getOrElse(Nil)
    // the full descriptor tuple, not just names: two dbfs with equal
    // names but drifted types/widths must also fail fast, else the
    // declared schema silently comes from whichever file sorts first
    val expectedSig = fields.map(f =>
      (f.name.toLowerCase, f.ftype, f.length, f.decimals))

    val schema = StructType(
      StructField("path", StringType, nullable = false) +:
      StructField("record_number", IntegerType, nullable = false) +:
      StructField("geometry", StringType, nullable = true) +:
      fields.map(f => StructField(f.name.toLowerCase, StringType, nullable = true)))
    val nAttrs = fields.size

    val rows = raw
      .groupByKey { case (p, _) => basename(p) }
      .flatMapGroups { (_: String, it: Iterator[(String, Array[Byte])]) =>
        val byExt = it.toSeq.groupBy { case (p, _) =>
          p.substring(p.lastIndexOf('.') + 1).toLowerCase
        }
        byExt.get("shp") match {
          case None => Iterator.empty // stray dbf without geometry file
          case Some(shps) =>
            val (shpPath, shpBytes) = shps.head
            val attrs: Seq[Seq[String]] = byExt.get("dbf")
              .map { d =>
                // fail fast on a mixed-schema directory: every dbf must
                // declare the schema dbf's exact field descriptors
                // (name, type, width, decimals) — name-only comparison
                // would pass type/width drift and silently report the
                // first file's declared schema for all of them
                val sig = parseDbfHeader(d.head._2)._4.map(f =>
                  (f.name.toLowerCase, f.ftype, f.length, f.decimals))
                if (sig != expectedSig) throw new IllegalArgumentException(
                  s"shapefile attribute schema mismatch at ${d.head._1}: " +
                    s"fields ${sig.mkString(",")} != schema dbf fields " +
                    s"${expectedSig.mkString(",")}")
                dbfRecords(d.head._2, encoding)
              }
              .getOrElse(Nil)
            shpGeometries(shpBytes).iterator.map { case (recNo, geom) =>
              val a = attrs.lift(recNo - 1) // record numbers are 1-based
                .getOrElse(Seq.fill[String](nAttrs)(null))
              Row.fromSeq(
                shpPath +: recNo +: geom.map(_.toWkt).orNull +: a)
            }
        }
      }(Encoders.row(schema))
    rows.toDF()
  }
}
