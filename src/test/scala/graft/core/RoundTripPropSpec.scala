package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trip properties over the pure geometry kernel (seeded —
  * deterministic): for random geometries with realistic milli-degree
  * coordinates,
  *   write(fmt=16) -> parse -> write(fmt=16)  is a fixed point, and
  *   parse(write(g)) reproduces g's coordinates exactly;
  *   WKB and GeoJSON round trips are structure- and value-exact.
  * Complements the transcribed reference goldens (ParserGoldenSpec /
  * WriterGoldenSpec) with breadth the hand-written corpus can't reach.
  */
class RoundTripPropSpec extends AnyFunSuite {

  private def coord(rnd: scala.util.Random): Double =
    (rnd.nextInt(360001) - 180000) / 1000.0 // [-180.000, 180.000] milli-deg

  // per-geometry dimensionality 2..4 (reference accepts X Y [Z [M]] —
  // R/wkt2geojson.R:47, R/lint.R:97-107); POINT stays 2-D like point.numeric
  private def pos(rnd: scala.util.Random, dim: Int): Vector[Double] =
    Vector.fill(dim)(coord(rnd))

  private def ring(rnd: scala.util.Random, dim: Int): Vector[Vector[Double]] = {
    val n = 3 + rnd.nextInt(5)
    val pts = Vector.fill(n)(pos(rnd, dim))
    pts :+ pts.head // closed
  }

  private def randomGeom(rnd: scala.util.Random): Geom = {
    val dim = 2 + rnd.nextInt(3)
    rnd.nextInt(7) match {
      case 0 => Geom.point(pos(rnd, 2))
      case 1 => Geom.lineString(Vector.fill(2 + rnd.nextInt(6))(pos(rnd, dim)))
      case 2 => Geom.polygon(Vector.fill(1 + rnd.nextInt(3))(ring(rnd, dim)))
      case 3 => Geom.multiPoint(Vector.fill(1 + rnd.nextInt(6))(pos(rnd, dim)))
      case 4 => Geom.multiLineString(Vector.fill(1 + rnd.nextInt(3))(
        Vector.fill(2 + rnd.nextInt(4))(pos(rnd, dim))))
      case 5 => Geom.multiPolygon(Vector.fill(1 + rnd.nextInt(3))(
        Vector.fill(1 + rnd.nextInt(2))(ring(rnd, dim))))
      case _ => Geom.collection(Vector(
        Geom.point(pos(rnd, 2)),
        Geom.lineString(Vector.fill(3)(pos(rnd, dim)))))
    }
  }

  test("WKT write -> parse -> write is a fixed point (1000 random geometries)") {
    val rnd = new scala.util.Random(20260816L)
    for (i <- 0 until 1000) {
      val g = randomGeom(rnd)
      val wkt = WktWriter.write(g, 16)
      val back = WktParser.parse(wkt)
      val wkt2 = WktWriter.write(back, 16)
      assert(wkt == wkt2, s"iteration $i: $wkt != $wkt2")
      assert(g.allPositions.toVector == back.allPositions.toVector,
        s"iteration $i: coordinates drifted through WKT")
    }
  }

  test("WKB round trip is exact (500 random geometries)") {
    val rnd = new scala.util.Random(77L)
    for (i <- 0 until 500) {
      val g = randomGeom(rnd)
      val back = Wkb.fromWkb(Wkb.toWkb(g))
      assert(back.typeTag == g.typeTag, s"iteration $i: type drifted")
      assert(g.allPositions.toVector == back.allPositions.toVector,
        s"iteration $i: coordinates drifted through WKB")
    }
  }

  test("GeoJSON round trip is exact (500 random geometries)") {
    val rnd = new scala.util.Random(13L)
    for (i <- 0 until 500) {
      val g = randomGeom(rnd)
      val back = GeoJson.parse(GeoJson.toJson(g))
      assert(back.typeTag == g.typeTag, s"iteration $i: type drifted")
      assert(g.allPositions.toVector == back.allPositions.toVector,
        s"iteration $i: coordinates drifted through GeoJSON")
    }
  }
}
