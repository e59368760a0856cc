package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Writer + constructor goldens transcribed verbatim from the reference
  * test suite (tests/testthat/test-geojson2wkt.r, test-point.R,
  * test-linestring.R, test-multipoint.R, test-polygon.R,
  * test-multipolygon.R, test-multilinestring.R, test-circularstring.R,
  * test-geometrycollection.R). */
class WriterGoldenSpec extends AnyFunSuite {
  import WktWriter._

  // ---- geojson2wkt dump goldens ----

  test("dump point pads to common width (test-geojson2wkt.r:8)") {
    assert(dumpPoint(Seq(116.4, 45.2), 16) ==
      "POINT (116.4000000000000057  45.2000000000000028)")
  }

  test("dump multipoint fmt=16 (test-geojson2wkt.r:17)") {
    assert(dumpMultiPoint(Seq(Seq(100.0, 3.101), Seq(101.0, 2.1), Seq(3.14, 2.18)), 16) ==
      "MULTIPOINT ((100.0000000000000000 3.1010000000000000), (101.0000000000000000 2.1000000000000001), (3.1400000000000001 2.1800000000000002))")
  }

  test("dump linestring fmt=0 (test-geojson2wkt.r:27)") {
    val pts = Seq(Seq(0.0, 0.0, 10.0), Seq(2.0, 1.0, 20.0), Seq(4.0, 2.0, 30.0), Seq(5.0, 4.0, 40.0))
    assert(dumpLineString(pts, 0) == "LINESTRING (0 0 10, 2 1 20, 4 2 30, 5 4 40)")
    // fmt=1: 12 coords, each with exactly one decimal point (":31-32")
    assert(dumpLineString(pts, 1).count(_ == '.') == 12)
  }

  test("dump multilinestring fmt=0, 7-sig interplay (test-geojson2wkt.r:41)") {
    val lines = Seq(
      Seq(Seq(0.0, -1.0), Seq(-2.0, -3.0), Seq(-4.0, -5.0)),
      Seq(Seq(1.66, -31023.5), Seq(10000.9999, 3.0), Seq(100.9, 1.1), Seq(0.0, 0.0)))
    assert(dumpMultiLineString(lines, 0) ==
      "MULTILINESTRING ((0 -1, -2 -3, -4 -5), (1.66 -31023.50, 10001 3, 100.9 1.1, 0 0))")
  }

  test("dump polygon fmt=0 with 101.12345 (test-geojson2wkt.r:53)") {
    val rings = Seq(
      Seq(Seq(100.001, 0.001), Seq(101.12345, 0.001), Seq(101.001, 1.001), Seq(100.001, 0.001)),
      Seq(Seq(100.201, 0.201), Seq(100.801, 0.201), Seq(100.801, 0.801), Seq(100.201, 0.201)))
    assert(dumpPolygon(rings, 0) ==
      "POLYGON ((100.001 0.001, 101.1235 0.0010, 101.001 1.001, 100.001 0.001), (100.201 0.201, 100.801 0.201, 100.801 0.801, 100.201 0.201))")
  }

  test("dump multipolygon fmt=0 (test-geojson2wkt.r:65)") {
    val polys = Seq(
      Seq(Seq(Seq(30.0, 20.0), Seq(45.0, 40.0), Seq(10.0, 40.0), Seq(30.0, 20.0))),
      Seq(Seq(Seq(15.0, 5.0), Seq(40.0, 10.0), Seq(10.0, 20.0), Seq(5.0, 10.0), Seq(15.0, 5.0))))
    assert(dumpMultiPolygon(polys, 0) ==
      "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))")
  }

  test("dump geometrycollection fmt=0 (test-geojson2wkt.r:81)") {
    val gc = Geom.collection(Vector(
      Geom.point(Vector(0.0, 1.0)),
      Geom.lineString(Vector(Vector(-100.0, 0.0), Vector(-101.0, -1.0))),
      Geom.multiPoint(Vector(Vector(100.0, 3.101), Vector(101.0, 2.1), Vector(3.14, 2.18)))))
    assert(WktWriter.write(gc, 0) ==
      "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (-100 0, -101 -1), MULTIPOINT ((100.000 3.101), (101.0 2.1), (3.14 2.18)))")
  }

  // ---- constructor goldens ----

  test("point constructor (test-point.R:16-46)") {
    assert(pointWkt(Seq(-116.4, 45.2), 16) == "POINT (-116.4000000000000057 45.2000000000000028)")
    assert(pointWkt(Seq(-116.4, 45.2), 1) == "POINT (-116.4 45.2)")
    assert(pointWkt(Seq(-116.4, 45.2), 2) == "POINT (-116.40 45.20)")
    assert(pointWkt(Seq(32.45, -99.74), 16) == "POINT (32.4500000000000028 -99.7399999999999949)")
    assert(pointWkt(Seq(-99.74, 32.45), 0) == "POINT (-99.74 32.45)")
    assert(pointWkt(Seq(100.0, 3.1), 2) == "POINT (100.00 3.10)")
    assert(emptyWkt("point") == "POINT EMPTY")
  }

  test("linestring constructor (test-linestring.R:13-34)") {
    assert(lineStringWkt(Seq(Seq(100.0, 3.101), Seq(101.0, 2.1), Seq(3.14, 2.18)), 0) ==
      "LINESTRING (100.000 3.101, 101.0 2.1, 3.14 2.18)")
    assert(lineStringWkt(Seq(Seq(-116.4, 45.2), Seq(-118.0, 47.0)), 1) ==
      "LINESTRING (-116.4 45.2, -118.0 47.0)")
    assert(lineStringWkt(Seq(Seq(100.0, 0.0), Seq(101.0, 1.0)), 0) == "LINESTRING (100 0, 101 1)")
    assert(emptyWkt("linestring") == "LINESTRING EMPTY")
  }

  test("multipoint constructor (test-multipoint.R:13-34)") {
    assert(multiPointWkt(Seq(Seq(100.0, 3.101), Seq(101.0, 2.1), Seq(3.14, 2.18)), 0) ==
      "MULTIPOINT ((100.000 3.101), (101.0 2.1), (3.14 2.18))")
    val usc = Seq(Seq(-99.74, 32.45), Seq(-81.52, 41.08), Seq(-122.26, 37.77),
      Seq(-84.18, 31.58), Seq(-73.8, 42.67))
    assert(multiPointWkt(usc, 0) ==
      "MULTIPOINT ((-99.74 32.45), (-81.52 41.08), (-122.26 37.77), (-84.18 31.58), (-73.80 42.67))")
    assert(emptyWkt("multipoint") == "MULTIPOINT EMPTY")
  }

  test("polygon constructor (test-polygon.R:13-43)") {
    assert(polygonWkt(Seq(Seq(Seq(100.0, 0.1), Seq(101.0, 0.1), Seq(101.0, 1.1), Seq(100.0, 0.1))), 0) ==
      "POLYGON ((100.0 0.1, 101.0 0.1, 101.0 1.1, 100.0 0.1))")
    val r1 = Seq(Seq(-81.52, 41.08), Seq(-122.26, 37.77), Seq(-84.18, 31.58), Seq(-73.8, 42.67), Seq(-81.52, 41.08))
    assert(polygonWkt(Seq(r1), 2) ==
      "POLYGON ((-81.52 41.08, -122.26 37.77, -84.18 31.58, -73.80 42.67, -81.52 41.08))")
    val r2 = Seq(Seq(-85.9, 37.5), Seq(-85.9, 35.3), Seq(-93.0, 35.3), Seq(-93.0, 37.5), Seq(-85.9, 37.5))
    assert(polygonWkt(Seq(r1, r2), 0) ==
      "POLYGON ((-81.52 41.08, -122.26 37.77, -84.18 31.58, -73.80 42.67, -81.52 41.08), (-85.9 37.5, -85.9 35.3, -93.0 35.3, -93.0 37.5, -85.9 37.5))")
    assert(polygonWkt(Seq(Seq(Seq(100.001, 0.001), Seq(101.12345, 0.001), Seq(101.001, 1.001), Seq(100.001, 0.001))), 2) ==
      "POLYGON ((100.001 0.001, 101.1235 0.0010, 101.001 1.001, 100.001 0.001))")
    assert(emptyWkt("polygon") == "POLYGON EMPTY")
  }

  test("multipolygon constructor (test-multipolygon.R:10-30)") {
    val p1 = Seq(Seq(Seq(30.0, 20.0), Seq(45.0, 40.0), Seq(10.0, 40.0), Seq(30.0, 20.0)))
    val p2 = Seq(Seq(Seq(15.0, 5.0), Seq(40.0, 10.0), Seq(10.0, 20.0), Seq(5.0, 10.0), Seq(15.0, 5.0)))
    assert(multiPolygonWkt(Seq(p1, p2), 0) ==
      "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))")
    assert(emptyWkt("multipolygon") == "MULTIPOLYGON EMPTY")
  }

  test("multilinestring constructor (test-multilinestring.R:10-60)") {
    val l1 = Seq(Seq(30.0, 20.0), Seq(45.0, 40.0), Seq(10.0, 40.0))
    val l2 = Seq(Seq(15.0, 5.0), Seq(40.0, 10.0), Seq(10.0, 20.0))
    assert(multiLineStringWkt(Seq(l1, l2), 0) ==
      "MULTILINESTRING ((30 20, 45 40, 10 40), (15 5, 40 10, 10 20))")
    assert(emptyWkt("multilinestring") == "MULTILINESTRING EMPTY")
  }

  test("circularstring constructor (test-circularstring.R:10-38)") {
    assert(circularStringWkt(Seq(Seq(-116.4, 45.2), Seq(-118.0, 47.0)), 1) ==
      "CIRCULARSTRING (-116.4 45.2, -118.0 47.0)")
    assert(circularStringWkt(Seq(Seq(1.0, 5.0), Seq(6.0, 2.0), Seq(7.0, 3.0)), 2) ==
      "CIRCULARSTRING (1.00 5.00, 6.00 2.00, 7.00 3.00)")
    assert(emptyWkt("circularstring") == "CIRCULARSTRING EMPTY")
  }

  test("constructor failure contracts (test-point.R:50-53 et al)") {
    val e1 = intercept[IllegalArgumentException](pointWkt(Seq(-116.4), 16))
    assert(e1.getMessage.contains("POINT input should be of length 2"))
    val e2 = intercept[IllegalArgumentException](lineStringWkt(Seq(Seq(-116.4)), 16))
    assert(e2.getMessage.contains("LINESTRING input should be of length 2"))
    val e3 = intercept[IllegalArgumentException](multiPointWkt(Seq(Seq(-116.4)), 16))
    assert(e3.getMessage.contains("POINT input should be of length 2")) // substring of MULTIPOINT msg
    val e4 = intercept[IllegalArgumentException](pointWkt(Seq(1.0, 2.0), 21))
    assert(e4.getMessage.contains("fmt must be 0 and 20"))
    intercept[IllegalArgumentException](pointWkt(Seq(1.0, 2.0), -1))
  }

  test("geometrycollection constructor (test-geometrycollection.R:7-26)") {
    assert(geometryCollectionWkt(Seq(pointWkt(Seq(-116.4, 45.2), 16))) ==
      "GEOMETRYCOLLECTION (POINT (-116.4000000000000057 45.2000000000000028))")
    assert(geometryCollectionWkt(Seq(
      pointWkt(Seq(-116.4, 45.2), 2),
      "LINESTRING (-116.4 45.2, -118.0 47.0)",
      circularStringWkt(Seq(Seq(1.0, 5.0), Seq(6.0, 2.0), Seq(7.0, 3.0)), 2))) ==
      "GEOMETRYCOLLECTION (POINT (-116.40 45.20), LINESTRING (-116.4 45.2, -118.0 47.0), CIRCULARSTRING (1.00 5.00, 6.00 2.00, 7.00 3.00))")
    assert(emptyWkt("geometrycollection") == "GEOMETRYCOLLECTION EMPTY")
    val e = intercept[IllegalArgumentException](geometryCollectionWkt(Seq("POINT(5)")))
    assert(e.getMessage.contains("All inputs must be WKT strings"))
  }
}
