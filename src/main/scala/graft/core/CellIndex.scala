package graft.core

import scala.collection.mutable.ArrayBuffer

/** From-scratch hierarchical cell index (S2/H3-style, offline-safe — no H3
  * jar exists in this environment; see SURVEY.md §7.3).
  *
  * Grid: equirectangular quadtree over lon ∈ [-180,180), lat ∈ [-90,90).
  * A cell id is a packed Long: [ level (6 bits) | Morton-interleaved
  * (ix, iy) at `level` bits each (62 bits max) ], so cells at different
  * levels never collide and shuffle-hash cheaply as LongType.
  *
  * Key property used by the spatial join: `cover` produces a set of
  * MUTUALLY DISJOINT cells (a quadtree cover), so a point's ancestor chain
  * (`ancestors`) intersects any cover in AT MOST ONE cell — the cell
  * equijoin therefore needs no de-duplication shuffle.
  */
object CellIndex {
  val MaxLevel = 26

  @inline def pack(level: Int, morton: Long): Long = (level.toLong << 56) | morton
  @inline def levelOf(cell: Long): Int = (cell >>> 56).toInt
  @inline def mortonOf(cell: Long): Long = cell & 0x00ffffffffffffffL

  /** Interleave 28-bit ix (even bits) and iy (odd bits). */
  def interleave(ix: Long, iy: Long): Long = {
    @inline def spread(v0: Long): Long = {
      var v = v0 & 0x0fffffffL
      v = (v | (v << 16)) & 0x0000ffff0000ffffL
      v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    spread(ix) | (spread(iy) << 1)
  }

  @inline def clampIdx(i: Long, level: Int): Long = {
    val max = (1L << level) - 1
    if (i < 0) 0 else if (i > max) max else i
  }

  def cellXY(lon: Double, lat: Double, level: Int): (Long, Long) = {
    val n = 1L << level
    val ix = clampIdx(math.floor((lon + 180.0) / 360.0 * n).toLong, level)
    val iy = clampIdx(math.floor((lat + 90.0) / 180.0 * n).toLong, level)
    (ix, iy)
  }

  /** Cell containing (lon, lat) at `level`. */
  def cell(lon: Double, lat: Double, level: Int): Long = {
    val (ix, iy) = cellXY(lon, lat, level)
    pack(level, interleave(ix, iy))
  }

  /** The cell's ancestors at every level 0..maxLevel, INCLUDING itself —
    * the point-side join key set. */
  def ancestors(lon: Double, lat: Double, maxLevel: Int): Array[Long] = {
    val out = new Array[Long](maxLevel + 1)
    val (ix, iy) = cellXY(lon, lat, maxLevel)
    var l = maxLevel
    var x = ix; var y = iy
    while (l >= 0) {
      out(l) = pack(l, interleave(x, y))
      x >>= 1; y >>= 1
      l -= 1
    }
    out
  }

  /** Cell bounds (lonMin, latMin, lonMax, latMax). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val level = levelOf(cell)
    val m = mortonOf(cell)
    @inline def compact(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >> 8)) & 0x0000ffff0000ffffL
      v = (v | (v >> 16)) & 0x0fffffffL
      v
    }
    val ix = compact(m)
    val iy = compact(m >> 1)
    val n = (1L << level).toDouble
    val w = 360.0 / n; val h = 180.0 / n
    val lonMin = -180.0 + ix * w
    val latMin = -90.0 + iy * h
    (lonMin, latMin, lonMin + w, latMin + h)
  }

  /** Cell width in degrees at `level` (longitude axis). */
  @inline def cellWidthDeg(level: Int): Double = 360.0 / (1L << level).toDouble

  // ---------- polygon covering ----------

  /** One cover cell: `full=true` means the cell is entirely inside the
    * polygon (join matches skip ray-cast refinement). */
  final case class CoverCell(cell: Long, full: Boolean)

  private def segIntersectsRect(
      x1: Double, y1: Double, x2: Double, y2: Double,
      rx0: Double, ry0: Double, rx1: Double, ry1: Double): Boolean = {
    // quick rejects
    if (math.max(x1, x2) < rx0 || math.min(x1, x2) > rx1 ||
        math.max(y1, y2) < ry0 || math.min(y1, y2) > ry1) return false
    // endpoint inside
    if ((x1 >= rx0 && x1 <= rx1 && y1 >= ry0 && y1 <= ry1) ||
        (x2 >= rx0 && x2 <= rx1 && y2 >= ry0 && y2 <= ry1)) return true
    // segment vs each rect edge
    @inline def ccw(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    @inline def segSeg(ax: Double, ay: Double, bx: Double, by: Double,
                       cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
      val d1 = ccw(cx, cy, dx, dy, ax, ay)
      val d2 = ccw(cx, cy, dx, dy, bx, by)
      val d3 = ccw(ax, ay, bx, by, cx, cy)
      val d4 = ccw(ax, ay, bx, by, dx, dy)
      ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) && ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0)) ||
        d1 == 0 || d2 == 0 || d3 == 0 || d4 == 0
    }
    segSeg(x1, y1, x2, y2, rx0, ry0, rx1, ry0) ||
      segSeg(x1, y1, x2, y2, rx1, ry0, rx1, ry1) ||
      segSeg(x1, y1, x2, y2, rx1, ry1, rx0, ry1) ||
      segSeg(x1, y1, x2, y2, rx0, ry1, rx0, ry0)
  }

  private def anyEdgeIntersects(
      rings: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      rx0: Double, ry0: Double, rx1: Double, ry1: Double): Boolean = {
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var i = 0
      var j = ring.length - 1
      while (i < ring.length) {
        if (segIntersectsRect(ring(j)(0), ring(j)(1), ring(i)(0), ring(i)(1), rx0, ry0, rx1, ry1))
          return true
        j = i; i += 1
      }
      r += 1
    }
    false
  }

  /** Batched quadtree covering of a polygon geometry (north_star: "batched
    * covering algorithm"): descend from the coarsest cells; a cell whose
    * bbox is disjoint from the polygon bbox or whose interior test fails is
    * dropped; a cell with no edge crossing whose center is inside is FULL;
    * at maxLevel (or when the budget is exhausted) remaining cells are
    * emitted as partial (refine-with-raycast). Output cells are disjoint.
    *
    * For Point/MultiPoint/LineString inputs, emits the partial leaf cells
    * containing the vertices at maxLevel.
    */
  def cover(g: Geom, maxLevel: Int, budget: Int = 256): Array[CoverCell] = {
    val rings = g.polygonRings
    if (rings.isEmpty) {
      // non-areal geometry: leaf cell per vertex
      val set = scala.collection.mutable.LinkedHashSet[Long]()
      g.allPositions.foreach(p => set += cell(p(0), p(1), maxLevel))
      return set.iterator.map(CoverCell(_, full = false)).toArray
    }
    val (bx0, by0, bx1, by1) = g.bbox.get
    val out = ArrayBuffer[CoverCell]()
    // start level: coarsest level where the bbox spans <= 2 cells per axis
    var startLevel = 0
    while (startLevel < maxLevel &&
           (bx1 - bx0) < cellWidthDeg(startLevel + 1) &&
           (by1 - by0) < cellWidthDeg(startLevel + 1) / 2 * 1.0) startLevel += 1
    // (latitude cell height = cellWidthDeg/2 at same level since 180 vs 360)

    def descend(level: Int, ix: Long, iy: Long): Unit = {
      val n = 1L << level
      val w = 360.0 / n; val h = 180.0 / n
      val cx0 = -180.0 + ix * w; val cy0 = -90.0 + iy * h
      val cx1 = cx0 + w; val cy1 = cy0 + h
      // disjoint from polygon bbox?
      if (cx1 < bx0 || cx0 > bx1 || cy1 < by0 || cy0 > by1) return
      val crossed = anyEdgeIntersects(rings, cx0, cy0, cx1, cy1)
      if (!crossed) {
        // wholly inside or wholly outside: test center
        val inside = RayCast.containsRings(rings, (cx0 + cx1) / 2, (cy0 + cy1) / 2)
        if (inside) out += CoverCell(pack(level, interleave(ix, iy)), full = true)
        return
      }
      if (level >= maxLevel || out.length >= budget) {
        out += CoverCell(pack(level, interleave(ix, iy)), full = false)
        return
      }
      var dx = 0
      while (dx < 2) {
        var dy = 0
        while (dy < 2) {
          descend(level + 1, ix * 2 + dx, iy * 2 + dy)
          dy += 1
        }
        dx += 1
      }
    }

    // seed cells at startLevel overlapping the bbox
    val n0 = 1L << startLevel
    val ix0 = clampIdx(math.floor((bx0 + 180.0) / 360.0 * n0).toLong, startLevel)
    val ix1 = clampIdx(math.floor((bx1 + 180.0) / 360.0 * n0).toLong, startLevel)
    val iy0 = clampIdx(math.floor((by0 + 90.0) / 180.0 * n0).toLong, startLevel)
    val iy1 = clampIdx(math.floor((by1 + 90.0) / 180.0 * n0).toLong, startLevel)
    var ix = ix0
    while (ix <= ix1) {
      var iy = iy0
      while (iy <= iy1) { descend(startLevel, ix, iy); iy += 1 }
      ix += 1
    }
    out.toArray
  }

  // ---------- k-ring (kNN support) ----------

  /** Cells forming the square ring at Chebyshev distance `r` around the cell
    * of (lon, lat) at `level` (r=0 -> the cell itself). Clipped at grid
    * edges (no wraparound — synthetic data stays off the antimeridian). */
  def ring(lon: Double, lat: Double, level: Int, r: Int): Array[Long] = {
    val (cx, cy) = cellXY(lon, lat, level)
    val n = 1L << level
    if (r == 0) return Array(pack(level, interleave(cx, cy)))
    val out = ArrayBuffer[Long]()
    var dx = -r
    while (dx <= r) {
      var dy = -r
      while (dy <= r) {
        if (math.max(math.abs(dx), math.abs(dy)) == r) {
          val x = cx + dx; val y = cy + dy
          if (x >= 0 && x < n && y >= 0 && y < n)
            out += pack(level, interleave(x, y))
        }
        dy += 1
      }
      dx += 1
    }
    out.toArray
  }

  /** All cells within Chebyshev distance `r` (disk = rings 0..r). */
  def disk(lon: Double, lat: Double, level: Int, r: Int): Array[Long] = {
    val out = ArrayBuffer[Long]()
    var i = 0
    while (i <= r) { out ++= ring(lon, lat, level, i); i += 1 }
    out.toArray
  }
}
