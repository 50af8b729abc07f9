package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.geo.GeoWkt

/** Deterministic shapefile WRITER for the S4 driver-gate query
  * (q66): the reference only ever READS shapefiles
  * (batch/geo.py:35-49), so this exists purely to generate a
  * spec-conformant fixture from table data that [[ShapefileSource]]
  * then scans and the DuckDB oracle replicates. Subset: Point and
  * Polygon records plus a dBase III attribute table with C/N fields.
  * Driver-side by design — a fixture generator, not an operator (the
  * 25-row write is not a distributed workload).
  */
object ShapefileFixture {

  private def polyContent(rings: Seq[Seq[GeoWkt.Pt]]): Array[Byte] = {
    val numPoints = rings.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.size + 16 * numPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(5)
    (0 until 4).foreach(_ => bb.putDouble(0.0))
    bb.putInt(rings.size); bb.putInt(numPoints)
    var start = 0
    rings.foreach { r => bb.putInt(start); start += r.size }
    rings.foreach(_.foreach { p => bb.putDouble(p.x); bb.putDouble(p.y) })
    bb.array()
  }

  private def pointContent(p: GeoWkt.Pt): Array[Byte] = {
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1); bb.putDouble(p.x); bb.putDouble(p.y)
    bb.array()
  }

  /** Write `base.shp` + `base.dbf`. Geometries may mix Point/Polygon
    * (the .shp header advertises the first record's type; readers —
    * ours included — frame records individually, per spec). */
  def write(base: String, records: Seq[(GeoWkt.Geom, Seq[String])],
      fields: Seq[(String, Char, Int)], encoding: String = "ISO-8859-1"): Unit = {
    val contents = records.map {
      case (GeoWkt.Point(p), _) => pointContent(p)
      case (GeoWkt.Polygon(rings), _) => polyContent(rings)
      case (g, _) => throw new IllegalArgumentException(
        s"fixture writer supports Point/Polygon, got ${g.typeName}")
    }
    val total = 100 + contents.map(8 + _.length).sum
    val shp = ByteBuffer.allocate(total)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, total / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, if (records.headOption.exists(_._1.isInstanceOf[GeoWkt.Point])) 1 else 5)
    var off = 100
    contents.zipWithIndex.foreach { case (c, i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)
      shp.putInt(off + 4, c.length / 2)
      var j = 0
      while (j < c.length) { shp.put(off + 8 + j, c(j)); j += 1 }
      off += 8 + c.length
    }

    val headerSize = 32 + 32 * fields.size + 1
    val recordSize = 1 + fields.map(_._3).sum
    val dbf = ByteBuffer.allocate(headerSize + records.size * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, records.size)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, t, len), i) =>
      val o = 32 + 32 * i
      name.getBytes("US-ASCII").take(10).zipWithIndex
        .foreach { case (b, j) => dbf.put(o + j, b) }
      dbf.put(o + 11, t.toByte)
      dbf.put(o + 16, len.toByte)
    }
    dbf.put(32 + 32 * fields.size, 0x0d.toByte)
    records.zipWithIndex.foreach { case ((_, vals), r) =>
      var o = headerSize + r * recordSize
      dbf.put(o, ' '.toByte); o += 1
      fields.zip(vals).foreach { case ((_, t, len), v) =>
        val s = Option(v).getOrElse("")
        val padded = if (t == 'N') (" " * (len - s.length)) + s
          else s + (" " * (len - s.length))
        padded.getBytes(encoding).take(len).zipWithIndex
          .foreach { case (b, j) => dbf.put(o + j, b) }
        o += len
      }
    }
    Files.createDirectories(Paths.get(base).getParent)
    Files.write(Paths.get(s"$base.shp"), shp.array())
    Files.write(Paths.get(s"$base.dbf"), dbf.array())
  }
}
