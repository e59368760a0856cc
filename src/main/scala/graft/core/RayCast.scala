package graft.core

/** Exact even-odd ray-casting point-in-polygon — the refinement predicate of
  * the cell equijoin (north_star: "exact ray-casting point-in-polygon
  * refinement"). Hole-aware by parity: a point inside the shell and inside a
  * hole crosses an odd+odd = even number of edges and is reported outside.
  *
  * Crossing rule: the standard half-open rule ((yi > y) != (yj > y)) with the
  * x-intersection strictly to the right, which makes results independent of
  * ring orientation and consistent at shared vertices.
  */
object RayCast {

  /** Point-in-ring (even-odd, single ring, closed or open form). */
  def inRing(ring: IndexedSeq[IndexedSeq[Double]], x: Double, y: Double): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val xi = ring(i)(0); val yi = ring(i)(1)
      val xj = ring(j)(0); val yj = ring(j)(1)
      if ((yi > y) != (yj > y)) {
        val xCross = (xj - xi) * (y - yi) / (yj - yi) + xi
        if (x < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Point-in-polygon across all rings of a Polygon/MultiPolygon geometry:
    * overall parity of crossings over every ring (shell + holes across all
    * member polygons). */
  def contains(g: Geom, x: Double, y: Double): Boolean = {
    var parity = false
    g.polygonRings.foreach { ring =>
      if (inRing(ring, x, y)) parity = !parity
    }
    parity
  }

  /** Point-in-rings over a raw rank-3 rings array (used by the Catalyst
    * expression hot path — avoids building a Geom). */
  def containsRings(rings: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], x: Double, y: Double): Boolean = {
    var parity = false
    var r = 0
    while (r < rings.length) {
      if (inRing(rings(r), x, y)) parity = !parity
      r += 1
    }
    parity
  }
}
