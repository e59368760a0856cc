package graft.core

/** Geometry value model — the engine's canonical in-memory geometry.
  *
  * Mirrors the reference's GeoJSON-like nesting (reference R/wkt2geojson.R:96-227):
  * every geometry is a type tag (wkx codes 1..7, reference inst/js/wkx.js:1948-1956)
  * plus rank-3 nesting of positions (a position = 2..4 doubles):
  *
  *  - Point(1):            coords(0)(0)(0)
  *  - LineString(2):       coords(0)(0)
  *  - Polygon(3):          coords(0) = rings (shell + holes)
  *  - MultiPoint(4):       coords(0)(0)
  *  - MultiLineString(5):  coords(0) = lines
  *  - MultiPolygon(6):     coords    = polygons -> rings -> positions
  *  - GeometryCollection(7): parts (one level deep, like the reference
  *    R/wkt2geojson.R:194-205 — nested GCs are out of model)
  */
final case class Geom(
    typeTag: Int,
    coords: Vector[Vector[Vector[Vector[Double]]]],
    parts: Vector[Geom] = Vector.empty
) {
  def dim: Int = {
    val it = allPositions
    if (it.hasNext) it.next().length else 2
  }

  /** No coordinates anywhere: covers both shape-empty nesting (MULTIPOINT
    * EMPTY -> no positions) and the empty point's single zero-length
    * position (POINT EMPTY -> coords(0)(0)(0) == Vector.empty). A
    * GeometryCollection is empty iff it has no parts (GEOMETRYCOLLECTION
    * EMPTY — matches the reference's grepl("empty") semantics); one with
    * parts is never empty here (members report their own emptiness). */
  def isEmptyGeom: Boolean =
    if (typeTag == GeomType.GeometryCollection) parts.isEmpty
    else coords.forall(_.forall(_.forall(_.isEmpty)))

  /** Iterator over every position in the geometry (recursing into parts). */
  def allPositions: Iterator[Vector[Double]] =
    coords.iterator.flatMap(_.iterator.flatMap(_.iterator)) ++ parts.iterator.flatMap(_.allPositions)

  /** Bounding box (minX, minY, maxX, maxY); None when no positions. */
  def bbox: Option[(Double, Double, Double, Double)] = {
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    var any = false
    allPositions.foreach { p =>
      any = true
      if (p(0) < minX) minX = p(0); if (p(0) > maxX) maxX = p(0)
      if (p(1) < minY) minY = p(1); if (p(1) > maxY) maxY = p(1)
    }
    if (any) Some((minX, minY, maxX, maxY)) else None
  }

  /** Rings as used by point-in-polygon: for Polygon the rings, for
    * MultiPolygon all rings of all polygons, else empty. */
  def polygonRings: Vector[Vector[Vector[Double]]] = typeTag match {
    case GeomType.Polygon      => coords.headOption.getOrElse(Vector.empty)
    case GeomType.MultiPolygon => coords.flatten
    case GeomType.GeometryCollection => parts.flatMap(_.polygonRings)
    case _                     => Vector.empty
  }
}

object GeomType {
  val Point = 1
  val LineString = 2
  val Polygon = 3
  val MultiPoint = 4
  val MultiLineString = 5
  val MultiPolygon = 6
  val GeometryCollection = 7

  val names: Map[Int, String] = Map(
    Point -> "Point", LineString -> "LineString", Polygon -> "Polygon",
    MultiPoint -> "MultiPoint", MultiLineString -> "MultiLineString",
    MultiPolygon -> "MultiPolygon", GeometryCollection -> "GeometryCollection")

  val wktNames: Map[Int, String] = names.map { case (k, v) => k -> v.toUpperCase }
}

object Geom {
  def point(pos: Vector[Double]): Geom =
    Geom(GeomType.Point, Vector(Vector(Vector(pos))))
  def lineString(pts: Vector[Vector[Double]]): Geom =
    Geom(GeomType.LineString, Vector(Vector(pts)))
  def multiPoint(pts: Vector[Vector[Double]]): Geom =
    Geom(GeomType.MultiPoint, Vector(Vector(pts)))
  def polygon(rings: Vector[Vector[Vector[Double]]]): Geom =
    Geom(GeomType.Polygon, Vector(rings))
  def multiLineString(lines: Vector[Vector[Vector[Double]]]): Geom =
    Geom(GeomType.MultiLineString, Vector(lines))
  def multiPolygon(polys: Vector[Vector[Vector[Vector[Double]]]]): Geom =
    Geom(GeomType.MultiPolygon, polys)
  def collection(parts: Vector[Geom]): Geom =
    Geom(GeomType.GeometryCollection, Vector.empty, parts)
}
