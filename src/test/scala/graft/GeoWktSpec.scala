package graft

import org.apache.spark.sql.functions._
import graft.geo.{GeoWkt, geofunctions}

/** WKT parser + promote matrix (reference: batch/geo.py:52-78) and the
  * Catalyst expression wrappers. */
class GeoWktSpec extends SparkSuite {
  import spark.implicits._

  test("parse round-trips the supported types") {
    assert(GeoWkt.parse("POINT (1 2)").get.toWkt == "POINT (1 2)")
    assert(GeoWkt.parse("POINT(1.5 -2.25)").get.toWkt == "POINT (1.5 -2.25)")
    assert(GeoWkt.parse("LINESTRING (0 0, 1 1, 2 0)").get.nPoints == 3)
    assert(GeoWkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 0))").get.typeName == "POLYGON")
    assert(GeoWkt.parse("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((9 9, 10 9, 10 10, 9 9)))")
      .get.nPoints == 8)
    assert(GeoWkt.parse("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))").get.nPoints == 4)
  }

  test("parse rejects garbage, trailing junk, unknown types, empty") {
    assert(GeoWkt.parse("").isEmpty)
    assert(GeoWkt.parse(null).isEmpty)
    assert(GeoWkt.parse("POINT (1)").isEmpty)
    assert(GeoWkt.parse("POINT (1 2) extra").isEmpty)
    assert(GeoWkt.parse("CIRCLE (1 2, 3)").isEmpty)
    assert(GeoWkt.parse("POLYGON (0 0, 1 1)").isEmpty) // missing ring parens
  }

  test("EWKT: SRID prefix parsed, stripped on print; malformed rejected") {
    // GEOSGeometry accepts EWKT; the schema pins geometry(...,28992)
    // (bagh_create.sql:37) — srid rides along, toWkt prints canonical WKT
    assert(GeoWkt.parseEwkt("SRID=28992;POINT (1 2)").get ==
      ((Some(28992), GeoWkt.Point(GeoWkt.Pt(1, 2)))))
    assert(GeoWkt.parse("SRID=28992;POINT (1 2)").get.toWkt == "POINT (1 2)")
    // lenient like GEOS: case-insensitive keyword, spaces around the int
    assert(GeoWkt.parseEwkt("srid=4326 ; POINT (1 2)").get._1.contains(4326))
    assert(GeoWkt.parseEwkt("SRID=28992 ;POINT (1 2)").get._1.contains(28992))
    assert(GeoWkt.parseEwkt("POINT (1 2)").get._1.isEmpty) // plain WKT -> no srid
    assert(GeoWkt.parseEwkt("SRID=abc;POINT (1 2)").isEmpty)
    assert(GeoWkt.parseEwkt("SRID=28992 POINT (1 2)").isEmpty) // no ';'
    // st_srid expression: declared srid | null
    val df = Seq((1L, "SRID=28992;POINT (1 2)"), (2L, "POINT (1 2)"),
      (3L, "SRID=9;garbage"), (4L, null)).toDF("id", "wkt")
    val out = df.select($"id", geofunctions.st_srid($"wkt").as("s"))
      .orderBy($"id").collect()
    assert(out(0).getInt(1) == 28992)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
    // st_castto strips the prefix through promote
    assert(df.filter($"id" === 1)
      .select(geofunctions.st_castto($"wkt", "MULTIPOINT"))
      .as[String].head() == "MULTIPOINT (1 2)")
  }

  test("promote matrix: single->multi of same family only (geo.py:58-77)") {
    val poly = GeoWkt.parse("POLYGON ((0 0, 1 0, 1 1, 0 0))").get
    assert(GeoWkt.promote(poly, "MULTIPOLYGON").get.typeName == "MULTIPOLYGON")
    assert(GeoWkt.promote(poly, "POLYGON").get eq poly)
    val pt = GeoWkt.parse("POINT (1 2)").get
    assert(GeoWkt.promote(pt, "MULTIPOINT").get.toWkt == "MULTIPOINT (1 2)")
    assert(GeoWkt.promote(pt, "MULTIPOLYGON").isEmpty) // wrong family -> reject
    val ls = GeoWkt.parse("LINESTRING (0 0, 1 1)").get
    assert(GeoWkt.promote(ls, "MULTILINESTRING").get.typeName == "MULTILINESTRING")
  }

  test("isValid: ring closure + min sizes") {
    assert(GeoWkt.isValid(GeoWkt.parse("POLYGON ((0 0, 1 0, 1 1, 0 0))").get))
    assert(!GeoWkt.isValid(GeoWkt.parse("POLYGON ((0 0, 1 0, 1 1))").get))   // 3 pts
    assert(!GeoWkt.isValid(GeoWkt.parse("POLYGON ((0 0, 1 0, 1 1, 2 2))").get)) // open
    assert(!GeoWkt.isValid(GeoWkt.parse("LINESTRING (5 5)").get))
  }

  test("Catalyst expressions: null-safe, usable in plans and SQL") {
    val df = Seq(
      (1L, "POINT (1 2)"),
      (2L, "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
      (3L, "garbage"),
      (4L, null)
    ).toDF("id", "wkt")
    val out = df.select($"id",
        geofunctions.st_geometrytype($"wkt").as("t"),
        geofunctions.st_npoints($"wkt").as("n"),
        geofunctions.st_castto($"wkt", "MULTIPOLYGON").as("mp"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == "POINT" && out(0).getInt(2) == 1 && out(0).isNullAt(3))
    assert(out(1).getString(1) == "POLYGON" &&
      out(1).getString(3) == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(3))
    assert(out(3).isNullAt(1))

    geofunctions.register(spark)
    df.createOrReplaceTempView("wkt_t")
    val viaSql = spark.sql(
      "SELECT count(*) FROM wkt_t WHERE st_isvalid(wkt)").collect().head.getLong(0)
    assert(viaSql == 2)
  }
}
