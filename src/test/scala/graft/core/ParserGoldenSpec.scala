package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Parser goldens + malformed-input tolerance matrix transcribed from the
  * reference tests/testthat/test-wkt2geojson.R. */
class ParserGoldenSpec extends AnyFunSuite {
  import WktParser.parse

  test("parse point (test-wkt2geojson.R:4-10)") {
    assert(parse("POINT (116.4000000000000057 45.2000000000000028)") ==
      Geom.point(Vector(116.4000000000000057, 45.2000000000000028)))
  }

  test("parse multipoint wrapped form (test-wkt2geojson.R:13-20)") {
    val mp = "MULTIPOINT ((100.0000000000000000 3.1010000000000000), (101.0000000000000000 2.1000000000000001), (3.1400000000000001 2.1800000000000002))"
    assert(parse(mp) == Geom.multiPoint(Vector(
      Vector(100.0, 3.101), Vector(101.0, 2.1), Vector(3.14, 2.18))))
  }

  test("parse multipoint bare form (R/wkt2geojson.R:121-133)") {
    assert(parse("MULTIPOINT (100.000 3.101, 101.00 2.10, 3.14 2.18)") ==
      Geom.multiPoint(Vector(Vector(100.0, 3.101), Vector(101.0, 2.1), Vector(3.14, 2.18))))
  }

  test("parse 3D linestring (test-wkt2geojson.R:23-31)") {
    assert(parse("LINESTRING (0 0 10, 2 1 20, 4 2 30, 5 4 40)") ==
      Geom.lineString(Vector(Vector(0.0, 0.0, 10.0), Vector(2.0, 1.0, 20.0),
        Vector(4.0, 2.0, 30.0), Vector(5.0, 4.0, 40.0))))
  }

  test("parse 4D linestring (R/wkt2geojson.R:47 example)") {
    assert(parse("LINESTRING (0 1 2 3, 4 5 6 7)") ==
      Geom.lineString(Vector(Vector(0.0, 1.0, 2.0, 3.0), Vector(4.0, 5.0, 6.0, 7.0))))
  }

  test("parse polygon with two rings (test-wkt2geojson.R:34-45)") {
    assert(parse("POLYGON ((100 1, 104 2, 101 3, 100 1), (100 1, 103 2, 101 5, 100 1))") ==
      Geom.polygon(Vector(
        Vector(Vector(100.0, 1.0), Vector(104.0, 2.0), Vector(101.0, 3.0), Vector(100.0, 1.0)),
        Vector(Vector(100.0, 1.0), Vector(103.0, 2.0), Vector(101.0, 5.0), Vector(100.0, 1.0)))))
  }

  test("parse multipolygon with hole (R/wkt2geojson.R:36-37 example)") {
    val s = "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)),\n   ((20 35, 45 20, 30 5, 10 10, 10 30, 20 35), (30 20, 20 25, 20 15, 30 20)))"
    assert(parse(s) == Geom.multiPolygon(Vector(
      Vector(Vector(Vector(40.0, 40.0), Vector(20.0, 45.0), Vector(45.0, 30.0), Vector(40.0, 40.0))),
      Vector(
        Vector(Vector(20.0, 35.0), Vector(45.0, 20.0), Vector(30.0, 5.0), Vector(10.0, 10.0), Vector(10.0, 30.0), Vector(20.0, 35.0)),
        Vector(Vector(30.0, 20.0), Vector(20.0, 25.0), Vector(20.0, 15.0), Vector(30.0, 20.0))))))
  }

  test("parse multilinestring with )( separator (R/wkt2geojson.R:51 example)") {
    assert(parse("MULTILINESTRING ((30 1, 40 30, 50 20)(10 0, 20 1))") ==
      Geom.multiLineString(Vector(
        Vector(Vector(30.0, 1.0), Vector(40.0, 30.0), Vector(50.0, 20.0)),
        Vector(Vector(10.0, 0.0), Vector(20.0, 1.0)))))
  }

  test("parse geometrycollection (R/wkt2geojson.R:56-69 example)") {
    val s = "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (-100 0, -101 -1), POLYGON ((100.001 0.001, 101.1235 0.0010, 101.001 1.001, 100.001 0.001), (100.201 0.201, 100.801 0.201, 100.801 0.801, 100.201 0.201)))"
    val g = parse(s)
    assert(g.typeTag == GeomType.GeometryCollection)
    assert(g.parts.length == 3)
    assert(g.parts(0) == Geom.point(Vector(0.0, 1.0)))
    assert(g.parts(1) == Geom.lineString(Vector(Vector(-100.0, 0.0), Vector(-101.0, -1.0))))
    assert(g.parts(2).typeTag == GeomType.Polygon)
    assert(g.parts(2).coords(0).length == 2)
  }

  test("tolerance matrix (test-wkt2geojson.R:48-63)") {
    // no space between type and coords
    assert(parse("POINT(116.4000000000000057 45.2000000000000028)") ==
      Geom.point(Vector(116.4000000000000057, 45.2000000000000028)))
    // trailing spaces
    assert(parse("POINT(116.4000000000000057 45.2000000000000028)  ").typeTag == GeomType.Point)
    // runs of spaces between coords
    assert(parse("POINT(116.4000000000000057      45.2000000000000028)") ==
      Geom.point(Vector(116.4000000000000057, 45.2000000000000028)))
    // missing closing paren is fine
    assert(parse("point (116.4000000000000057 45.2000000000000028") ==
      Geom.point(Vector(116.4000000000000057, 45.2000000000000028)))
    // misspelled type errors
    intercept[IllegalArgumentException](parse("POIN(116.4000000000000057 45.2000000000000028"))
    intercept[IllegalArgumentException](parse("POIN(116.400000000000005745.2000000000000028"))
    assert(parse("LINESTRING(0 0 10, 2 1 20, 4 2 30, 5 4 40)").typeTag == GeomType.LineString)
  }

  test("case-insensitive type keyword (test-wkt2geojson.R:65-70)") {
    for (s <- Seq("point", "Point", "poInt")) {
      assert(parse(s + " (116.4000000000000057 45.2000000000000028") ==
        Geom.point(Vector(116.4000000000000057, 45.2000000000000028)))
    }
  }

  test("round-trip parse(write(g)) == g on the goldens") {
    val gs = Seq(
      Geom.point(Vector(116.4, 45.2)),
      Geom.multiPoint(Vector(Vector(100.0, 3.101), Vector(101.0, 2.1))),
      Geom.lineString(Vector(Vector(0.0, 0.0, 10.0), Vector(2.0, 1.0, 20.0))),
      Geom.polygon(Vector(
        Vector(Vector(100.0, 1.0), Vector(104.0, 2.0), Vector(101.0, 3.0), Vector(100.0, 1.0)),
        Vector(Vector(100.0, 1.0), Vector(103.0, 2.0), Vector(101.0, 5.0), Vector(100.0, 1.0)))),
      Geom.multiLineString(Vector(
        Vector(Vector(30.0, 1.0), Vector(40.0, 30.0)), Vector(Vector(10.0, 0.0), Vector(20.0, 1.0)))),
      Geom.multiPolygon(Vector(
        Vector(Vector(Vector(40.0, 40.0), Vector(20.0, 45.0), Vector(45.0, 30.0), Vector(40.0, 40.0))))))
    for (g <- gs) assert(parse(WktWriter.write(g, 16)) == g, s"round-trip failed for $g")
  }

  test("centroid semantics (R/zzz.R:42-66)") {
    assert(Centroid.centroid(parse("POINT (-116.4000000000000057 45.2000000000000028)")) ==
      Some((-116.4000000000000057, 45.2000000000000028)))
    val Some((cx, cy)) = Centroid.centroid(parse("MULTIPOINT ((100.000 3.101), (101.000 2.100), (3.140 2.180))"))
    assert(math.abs(cx - (100.0 + 101.0 + 3.14) / 3) < 1e-12)
    assert(math.abs(cy - (3.101 + 2.1 + 2.18) / 3) < 1e-12)
    // mean of ALL vertices (not area weighted)
    val mp = parse("MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), ((20 35, 45 20, 30 5, 10 10, 10 30, 20 35), (30 20, 20 25, 20 15, 30 20)))")
    val Some((mx, my)) = Centroid.centroid(mp)
    val xs = Seq(40.0, 20, 45, 40, 20, 45, 30, 10, 10, 20, 30, 20, 20, 30)
    val ys = Seq(40.0, 45, 30, 40, 35, 20, 5, 10, 30, 35, 20, 25, 15, 20)
    assert(math.abs(mx - xs.sum / xs.length) < 1e-12)
    assert(math.abs(my - ys.sum / ys.length) < 1e-12)
  }
}
