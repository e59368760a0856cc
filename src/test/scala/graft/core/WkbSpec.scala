package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** WKB goldens from the reference README (README.md:312-360) — byte-exact
  * against the wkx encoding — plus round-trip properties. */
class WkbSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("point WKB golden (README.md:317)") {
    val g = WktParser.parse("POINT (-116.4 45.2)")
    assert(hex(Wkb.toWkb(g)) == "01010000009a999999991" +
      "95dc09a99999999994640".replaceAll("\\s", ""))
  }

  test("polygon WKB golden (README.md:345-350)") {
    val g = WktParser.parse("POLYGON ((100.0 0.0, 101.1 0.0, 101.0 1.0, 100.0 0.0))")
    val expected = ("01 03 00 00 00 01 00 00 00 04 00 00 00 00 00 00 00 00 00 59 40 00 00 " +
      "00 00 00 00 00 00 66 66 66 66 66 46 59 40 00 00 00 00 00 00 00 00 00 " +
      "00 00 00 00 40 59 40 00 00 00 00 00 00 f0 3f 00 00 00 00 00 00 59 40 " +
      "00 00 00 00 00 00 00 00").replaceAll("\\s", "")
    assert(hex(Wkb.toWkb(g)) == expected)
  }

  test("compact WKT writer matches wkx (README.md:336-358)") {
    assert(Wkb.toCompactWkt(WktParser.parse("POINT (-116.4 45.2)")) == "POINT(-116.4 45.2)")
    assert(Wkb.toCompactWkt(WktParser.parse("POLYGON ((100.0 0.0, 101.1 0.0, 101.0 1.0, 100.0 0.0))")) ==
      "POLYGON((100 0,101.1 0,101 1,100 0))")
    assert(Wkb.toCompactWkt(WktParser.parse("LINESTRING (-116.4 45.2, -118.0 47.0)")) ==
      "LINESTRING(-116.4 45.2,-118 47)")
    assert(Wkb.toCompactWkt(WktParser.parse("MULTIPOINT (100.000 3.101, 101.00 2.10, 3.14 2.18)")) ==
      "MULTIPOINT(100 3.101,101 2.1,3.14 2.18)")
  }

  test("WKB round-trips for all types incl. Z/ZM") {
    val wkts = Seq(
      "POINT (-116.4 45.2)",
      "LINESTRING (-116.4 45.2, -118.0 47.0)",
      "LINESTRING (0 0 10, 2 1 20, 4 2 30)",
      "LINESTRING (0 1 2 3, 4 5 6 7)",
      "MULTIPOINT (100.000 3.101, 101.00 2.10, 3.14 2.18)",
      "POLYGON ((100.0 0.0, 101.1 0.0, 101.0 1.0, 100.0 0.0))",
      "POLYGON ((100 1, 104 2, 101 3, 100 1), (100 1, 103 2, 101 5, 100 1))",
      "MULTILINESTRING ((30 1, 40 30, 50 20), (10 0, 20 1))",
      "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), ((20 35, 45 20, 30 5, 10 10, 10 30, 20 35), (30 20, 20 25, 20 15, 30 20)))",
      "GEOMETRYCOLLECTION (POINT (0 1), LINESTRING (-100 0, -101 -1))")
    for (w <- wkts) {
      val g = WktParser.parse(w)
      assert(Wkb.fromWkb(Wkb.toWkb(g)) == g, s"WKB round-trip failed for $w")
    }
  }

  test("WKB reader accepts big-endian input") {
    // hand-built big-endian POINT (1 2)
    val bb = java.nio.ByteBuffer.allocate(21)
    bb.put(0.toByte); bb.putInt(1); bb.putDouble(1.0); bb.putDouble(2.0)
    assert(Wkb.fromWkb(bb.array()) == Geom.point(Vector(1.0, 2.0)))
  }
}
