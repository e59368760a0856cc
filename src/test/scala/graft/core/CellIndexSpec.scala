package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CellIndexSpec extends AnyFunSuite {
  import CellIndex._

  private def randomPoints(n: Int, seed: Long): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextDouble() * 359.98 - 179.99, rnd.nextDouble() * 179.98 - 89.99))
  }

  test("cell ids pack level distinctly and bounds contain the point") {
    val rnd = new scala.util.Random(1)
    for ((lon, lat) <- randomPoints(500, 1)) {
      val level = rnd.nextInt(21)
      val c = cell(lon, lat, level)
      assert(levelOf(c) == level)
      val (x0, y0, x1, y1) = bounds(c)
      assert(lon >= x0 && lon < x1 + 1e-9)
      assert(lat >= y0 && lat < y1 + 1e-9)
    }
  }

  test("ancestors chain is consistent: each ancestor contains the point") {
    for ((lon, lat) <- randomPoints(500, 2)) {
      val anc = ancestors(lon, lat, 14)
      assert(anc.length == 15)
      anc.foreach { a =>
        val (x0, y0, x1, y1) = bounds(a)
        assert(lon >= x0 - 1e-9 && lon <= x1 + 1e-9)
        assert(lat >= y0 - 1e-9 && lat <= y1 + 1e-9)
      }
      // ancestors at each level equal direct cell computation
      for (l <- 0 to 14) assert(anc(l) == cell(lon, lat, l))
    }
  }

  test("cover is disjoint and a superset of the polygon (no false negatives)") {
    val poly = WktParser.parse(
      "POLYGON ((10 10, 40 12, 42 38, 12 40, 10 10), (20 20, 30 20, 30 30, 20 30, 20 20))")
    val cov = cover(poly, maxLevel = 9)
    assert(cov.nonEmpty)
    // disjoint: no cell is an ancestor of another
    val set = cov.map(_.cell).toSet
    for (c <- cov) {
      val lvl = levelOf(c.cell)
      var m = mortonOf(c.cell)
      var l = lvl - 1
      while (l >= 0) {
        m >>= 2
        assert(!set.contains(pack(l, m)), s"cover not disjoint at level $l")
        l -= 1
      }
    }
    // superset: every point inside the polygon lands in exactly one cover cell
    val rnd = new scala.util.Random(42)
    var found = 0
    for (_ <- 1 to 2000) {
      val lon = 5 + rnd.nextDouble() * 45
      val lat = 5 + rnd.nextDouble() * 45
      val inside = RayCast.contains(poly, lon, lat)
      val anc = ancestors(lon, lat, 9)
      val hits = anc.count(set.contains)
      assert(hits <= 1, "point ancestor chain hit >1 cover cell")
      if (inside) {
        assert(hits == 1, s"inside point ($lon,$lat) missed by cover")
        found += 1
        // full cells must truly be inside
        val hit = cov.find(cc => anc.contains(cc.cell)).get
        if (hit.full) assert(inside)
      }
    }
    assert(found > 100) // sanity: the sample really exercised the polygon
  }

  test("full cells of a cover are entirely inside the polygon") {
    val poly = WktParser.parse("POLYGON ((0 0, 60 0, 60 60, 0 60, 0 0))")
    val cov = cover(poly, maxLevel = 8)
    val fulls = cov.filter(_.full)
    assert(fulls.nonEmpty)
    val rnd = new scala.util.Random(7)
    for (cc <- fulls.take(50)) {
      val (x0, y0, x1, y1) = bounds(cc.cell)
      for (_ <- 1 to 20) {
        val lon = x0 + rnd.nextDouble() * (x1 - x0)
        val lat = y0 + rnd.nextDouble() * (y1 - y0)
        assert(RayCast.contains(poly, lon, lat))
      }
    }
  }

  test("raycast point-in-polygon with hole") {
    val poly = WktParser.parse(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(RayCast.contains(poly, 2, 2))
    assert(!RayCast.contains(poly, 5, 5)) // in the hole
    assert(!RayCast.contains(poly, 11, 5))
    assert(RayCast.contains(poly, 4.5, 3.9))
  }

  test("raycast agrees with multipolygon parity") {
    val mp = WktParser.parse(
      "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((20 20, 30 20, 30 30, 20 30, 20 20)))")
    assert(RayCast.contains(mp, 5, 5))
    assert(RayCast.contains(mp, 25, 25))
    assert(!RayCast.contains(mp, 15, 15))
  }

  test("ring and disk cells") {
    val r0 = ring(0.0, 0.0, 8, 0)
    assert(r0.length == 1)
    val r1 = ring(0.0, 0.0, 8, 1)
    assert(r1.length == 8)
    val d2 = disk(0.0, 0.0, 8, 2)
    assert(d2.length == 25)
    assert(d2.distinct.length == 25)
  }

  test("tile math matches slippy formulas") {
    assert(TileMath.tileX(0.0, 1) == 1)
    assert(TileMath.tileY(0.0, 1) == 1)
    assert(TileMath.tileX(-180.0, 4) == 0)
    // zoom 0 is always tile (0,0)
    for ((lon, lat) <- randomPoints(500, 3)) {
      assert(TileMath.tile(lon, lat, 0) == TileMath.pack(0, 0, 0))
      val (z, x, y) = TileMath.unpack(TileMath.tile(lon, lat, 9))
      assert(z == 9 && x >= 0 && x < 512 && y >= 0 && y < 512)
      // inverse bounds sanity
      assert(TileMath.tileLon(x, 9) <= lon && lon <= TileMath.tileLon(x + 1, 9))
    }
  }
}
