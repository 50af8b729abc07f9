package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.sources.ShapefileSource

/** S4 shapefile scan: binary fixtures are built here byte-by-byte
  * against the public ESRI spec (main-file header, record framing,
  * shape encodings) and the dBase III layout, then read back through
  * the Spark source. No GDAL anywhere — this is the test that the
  * from-scratch parser honors the format. */
class ShapefileSpec extends SparkSuite {
  import spark.implicits._

  // ---- fixture builders --------------------------------------------------

  private def shpFile(shapeType: Int, records: Seq[Array[Byte]]): Array[Byte] = {
    val total = 100 + records.map(8 + _.length).sum
    val out = ByteBuffer.allocate(total)
    out.order(ByteOrder.BIG_ENDIAN)
    out.putInt(0, 9994)             // file code
    out.putInt(24, total / 2)       // file length in 16-bit words
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(28, 1000)            // version
    out.putInt(32, shapeType)
    var off = 100
    records.zipWithIndex.foreach { case (content, i) =>
      out.order(ByteOrder.BIG_ENDIAN)
      out.putInt(off, i + 1)                 // 1-based record number
      out.putInt(off + 4, content.length / 2) // content length in words
      var j = 0
      while (j < content.length) { out.put(off + 8 + j, content(j)); j += 1 }
      off += 8 + content.length
    }
    out.array()
  }

  private def pointRecord(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
    bb.array()
  }

  /** PolyLine(3) / Polygon(5) record from parts (each a point list). */
  private def polyRecord(shapeType: Int, parts: Seq[Seq[(Double, Double)]],
      zTailDoubles: Int = 0): Array[Byte] = {
    val numPoints = parts.map(_.size).sum
    val size = 4 + 32 + 8 + 4 * parts.size + 16 * numPoints + 8 * zTailDoubles
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(shapeType)
    (0 until 4).foreach(_ => bb.putDouble(0.0)) // bbox, unchecked
    bb.putInt(parts.size); bb.putInt(numPoints)
    var start = 0
    parts.foreach { p => bb.putInt(start); start += p.size }
    parts.foreach(_.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) })
    (0 until zTailDoubles).foreach(_ => bb.putDouble(7.7)) // Z/M tail to ignore
    bb.array()
  }

  /** dBase III file: fields (name, type, len), rows as strings. */
  private def dbfFile(fields: Seq[(String, Char, Int)],
      rows: Seq[Seq[String]], encoding: String): Array[Byte] = {
    val headerSize = 32 + 32 * fields.size + 1
    val recordSize = 1 + fields.map(_._3).sum
    val bb = ByteBuffer.allocate(headerSize + rows.size * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 0x03.toByte)
    bb.putInt(4, rows.size)
    bb.putShort(8, headerSize.toShort)
    bb.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, t, len), i) =>
      val off = 32 + 32 * i
      val nb = name.getBytes("US-ASCII")
      nb.take(10).zipWithIndex.foreach { case (b, j) => bb.put(off + j, b) }
      bb.put(off + 11, t.toByte)
      bb.put(off + 16, len.toByte)
    }
    bb.put(32 + 32 * fields.size, 0x0d.toByte)
    rows.zipWithIndex.foreach { case (row, r) =>
      var off = headerSize + r * recordSize
      bb.put(off, ' '.toByte); off += 1
      fields.zip(row).foreach { case ((_, t, len), v) =>
        val s = Option(v).getOrElse("")
        // numeric fields right-justified, char fields left-justified
        val padded = if (t == 'N') (" " * (len - s.length)) + s
          else s + (" " * (len - s.length))
        val vb = padded.getBytes(encoding)
        vb.take(len).zipWithIndex.foreach { case (b, j) => bb.put(off + j, b) }
        off += len
      }
    }
    bb.array()
  }

  private def writeFixture(dir: String, base: String,
      shp: Array[Byte], dbf: Option[Array[Byte]]): String = {
    Files.write(Paths.get(s"$dir/$base.shp"), shp)
    dbf.foreach(d => Files.write(Paths.get(s"$dir/$base.dbf"), d))
    s"$dir/$base.shp"
  }

  // ---- tests ------------------------------------------------------------

  test("S4: point shapefile with ISO-8859-1 dbf attributes round-trips") {
    val dir = Files.createTempDirectory("graft-shp").toString
    val shp = shpFile(1, Seq(pointRecord(4.9, 52.4), pointRecord(5.1, 52.0)))
    // reference default encoding is ISO-8859-1 (geo.py:34): exercise a
    // latin-1 byte that is NOT valid UTF-8
    val dbf = dbfFile(
      Seq(("NAAM", 'C', 12), ("INWONERS", 'N', 8)),
      Seq(Seq("Schönberg", "812345"), Seq("Gaasperdam", "9")),
      "ISO-8859-1")
    val path = writeFixture(dir, "punten", shp, Some(dbf))
    val df = ShapefileSource.read(spark, path)
    assert(df.columns.toSeq ==
      Seq("path", "record_number", "geometry", "naam", "inwoners"))
    val rows = df.orderBy($"record_number")
      .select($"record_number", $"geometry", $"naam", $"inwoners")
      .as[(Int, String, String, String)].collect().toSeq
    assert(rows == Seq(
      (1, "POINT (4.9 52.4)", "Schönberg", "812345"),
      (2, "POINT (5.1 52)", "Gaasperdam", "9")))
  }

  test("S4: polygon ring grouping - holes, multi-outer, and the promote path") {
    val dir = Files.createTempDirectory("graft-shp").toString
    // record 1: one CW outer + one CCW hole -> POLYGON (outer, hole)
    val outer = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))
    // record 2: two CW outers, hole inside the SECOND -> MULTIPOLYGON
    val far = Seq((20.0, 0.0), (20.0, 6.0), (26.0, 6.0), (26.0, 0.0), (20.0, 0.0))
    val farHole = Seq((22.0, 2.0), (24.0, 2.0), (24.0, 4.0), (22.0, 4.0), (22.0, 2.0))
    val shp = shpFile(5, Seq(
      polyRecord(5, Seq(outer, hole)),
      polyRecord(5, Seq(outer, far, farHole))))
    val path = writeFixture(dir, "vlakken", shp, None)
    val df = ShapefileSource.read(spark, path)
    val wkts = df.orderBy($"record_number").select($"geometry")
      .as[String].collect().toSeq
    assert(wkts.head ==
      "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(wkts(1) == "MULTIPOLYGON (((0 0, 0 10, 10 10, 10 0, 0 0)), " +
      "((20 0, 20 6, 26 6, 26 0, 20 0), (22 2, 24 2, 24 4, 22 4, 22 2)))")
    // and the parsed WKT feeds the existing P4 promote matrix
    import graft.geo.GeoWkt
    val promoted = GeoWkt.promote(GeoWkt.parse(wkts.head).get, "MULTIPOLYGON")
    assert(promoted.exists(_.typeName == "MULTIPOLYGON"))
  }

  test("S4: polylines, Z-variant tails, and null shapes") {
    val dir = Files.createTempDirectory("graft-shp").toString
    val nullRec = { // Null shape (type 0): just the type int
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0); bb.array()
    }
    val line = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 0.5))
    val two = Seq(Seq((0.0, 0.0), (1.0, 0.0)), Seq((5.0, 5.0), (6.0, 5.0)))
    val shp = shpFile(3, Seq(
      polyRecord(3, Seq(line)),
      polyRecord(3, two),
      // PolyLineZ (13): same XY block + Z range/values tail, ignored
      polyRecord(13, Seq(line), zTailDoubles = 2 + line.size),
      nullRec))
    val path = writeFixture(dir, "lijnen", shp, None)
    val rows = ShapefileSource.read(spark, path)
      .orderBy($"record_number").select($"record_number", $"geometry")
      .as[(Int, Option[String])].collect().toSeq
    assert(rows == Seq(
      (1, Some("LINESTRING (0 0, 1 1, 2 0.5)")),
      (2, Some("MULTILINESTRING ((0 0, 1 0), (5 5, 6 5))")),
      (3, Some("LINESTRING (0 0, 1 1, 2 0.5)")),
      (4, None)))
  }

  test("S4 property: random point/polygon fixtures roundtrip to identical WKT") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.geo.GeoWkt
    import graft.sources.ShapefileFixture
    // integer-ish coords (doubles that print exactly) keep WKT text
    // comparison byte-stable through the binary roundtrip
    val genCoord = Gen.choose(-1000, 1000).map(_.toDouble / 4) // .0/.25/.5/.75
    val genPoint: Gen[GeoWkt.Geom] =
      for (x <- genCoord; y <- genCoord) yield GeoWkt.Point(GeoWkt.Pt(x, y))
    val genPoly: Gen[GeoWkt.Geom] = for {
      x <- genCoord; y <- genCoord; s <- Gen.choose(1, 40).map(_.toDouble)
    } yield GeoWkt.Polygon(Seq(Seq( // CW ring -> outer per spec
      GeoWkt.Pt(x, y), GeoWkt.Pt(x, y + s), GeoWkt.Pt(x + s, y + s),
      GeoWkt.Pt(x + s, y), GeoWkt.Pt(x, y))))
    def sample[A](g: Gen[A], seed: Long): A =
      g(Gen.Parameters.default, Seed(seed)).get
    for (trial <- 0 until 3) {
      val geomGen = if (trial % 2 == 0) genPoint else genPoly
      val geoms = (0 until 20).map(i => sample(geomGen, trial * 100L + i))
      val dir = Files.createTempDirectory(s"graft-shp-prop$trial").toString
      ShapefileFixture.write(s"$dir/rt", geoms.map(g => (g, Seq("r"))),
        Seq(("TAG", 'C', 2)))
      val got = graft.sources.ShapefileSource.read(spark, s"$dir/rt.shp")
        .orderBy($"record_number").select($"geometry").as[String]
        .collect().toSeq
      assert(got == geoms.map(_.toWkt), s"trial $trial roundtrip mismatch")
    }
  }

  test("S4: mixed-schema directory fails fast naming the offending dbf") {
    val dir = Files.createTempDirectory("graft-shp").toString
    val dbf1 = dbfFile(Seq(("CODE", 'C', 4)), Seq(Seq("A")), "ISO-8859-1")
    val dbf2 = dbfFile(Seq(("NAAM", 'C', 4)), Seq(Seq("B")), "ISO-8859-1")
    writeFixture(dir, "een", shpFile(1, Seq(pointRecord(1, 1))), Some(dbf1))
    writeFixture(dir, "twee", shpFile(1, Seq(pointRecord(2, 2))), Some(dbf2))
    val ex = intercept[Exception] {
      ShapefileSource.read(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("schema mismatch") && m.contains("twee.dbf")), msgs(ex))
  }

  test("S4: same-name dbfs with drifted type/width also fail fast") {
    val dir = Files.createTempDirectory("graft-shp").toString
    // identical field NAME — only the declared width differs; a
    // name-only check would accept this and silently report een.dbf's
    // schema for both files
    val dbf1 = dbfFile(Seq(("CODE", 'C', 4)), Seq(Seq("A")), "ISO-8859-1")
    val dbf2 = dbfFile(Seq(("CODE", 'C', 8)), Seq(Seq("B")), "ISO-8859-1")
    writeFixture(dir, "een", shpFile(1, Seq(pointRecord(1, 1))), Some(dbf1))
    writeFixture(dir, "twee", shpFile(1, Seq(pointRecord(2, 2))), Some(dbf2))
    val ex = intercept[Exception] {
      ShapefileSource.read(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("schema mismatch") && m.contains("twee.dbf")), msgs(ex))
  }

  test("S4: directory read fans out over multiple (shp, dbf) pairs") {
    val dir = Files.createTempDirectory("graft-shp").toString
    val dbf1 = dbfFile(Seq(("CODE", 'C', 4)), Seq(Seq("A")), "ISO-8859-1")
    val dbf2 = dbfFile(Seq(("CODE", 'C', 4)), Seq(Seq("B"), Seq("C")), "ISO-8859-1")
    writeFixture(dir, "een", shpFile(1, Seq(pointRecord(1, 1))), Some(dbf1))
    writeFixture(dir, "twee",
      shpFile(1, Seq(pointRecord(2, 2), pointRecord(3, 3))), Some(dbf2))
    val df = ShapefileSource.read(spark, dir)
    assert(df.count() == 3)
    val byCode = df.select($"code", $"geometry").as[(String, String)]
      .collect().toMap
    assert(byCode("A") == "POINT (1 1)")
    assert(byCode("C") == "POINT (3 3)")
  }
}
