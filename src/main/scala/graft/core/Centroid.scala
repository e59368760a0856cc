package graft.core

/** Mean-of-vertices centroid, matching the reference's `get_centroid`
  * (reference R/get_centroid.R:24-36, R/zzz.R:42-66): NOT area-weighted —
  * the arithmetic mean of every vertex, lon first. For a Point the
  * coordinates are returned directly; for a GeometryCollection the reference
  * computes mean of an empty vector (NaN) — we return None there.
  */
object Centroid {
  def centroid(g: Geom): Option[(Double, Double)] = g.typeTag match {
    case GeomType.Point =>
      val p = g.coords(0)(0)(0)
      if (p.length >= 2) Some((p(0), p(1))) else None
    case GeomType.GeometryCollection => None
    case _ =>
      var sx = 0.0; var sy = 0.0; var n = 0L
      g.allPositions.foreach { p => sx += p(0); sy += p(1); n += 1 }
      if (n == 0) None else Some((sx / n, sy / n))
  }
}
