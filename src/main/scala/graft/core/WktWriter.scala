package graft.core

import graft.core.RFormat.formatTuple

/** WKT writers reproducing the reference's `geojson2wkt` dump family
  * byte-for-byte (reference R/geojson2wkt.R:151-217), and the vectorized
  * constructor family (`point`/`multipoint`/.../`circularstring`/
  * `geometrycollection`, reference R/point.R:36-80 et al).
  *
  * Formatting contract: every coordinate tuple goes through
  * [[RFormat.formatTuple]]. `dump_point` is the only writer that pads to a
  * common width (R `format` without `trim` — reference R/geojson2wkt.R:153,
  * golden "POINT (116.4000000000000057  45.2000000000000028)",
  * tests/testthat/test-geojson2wkt.r:8); all other writers trim.
  */
object WktWriter {

  /** `fmtcheck` (reference R/zzz.R:33-36): 0 <= fmt <= 20, reference's own
    * quirky message preserved. */
  def fmtCheck(fmt: Int): Unit =
    if (fmt < 0 || fmt > 20)
      throw new IllegalArgumentException("fmt must be 0 and 20")

  /** `checker` arity guard (reference R/zzz.R:26-31). */
  def arityCheck(pos: Seq[Double], typeName: String, lens: Seq[Int]): Unit =
    if (!lens.contains(pos.length))
      throw new IllegalArgumentException(
        s"$typeName input should be of length ${lens.mkString(" ")}")

  private def tup(pos: Seq[Double], fmt: Int): String =
    formatTuple(pos, fmt, pad = false).mkString(" ")

  def dumpPoint(pos: Seq[Double], fmt: Int): String =
    s"POINT (${formatTuple(pos, fmt, pad = true).mkString(" ")})"

  def dumpMultiPoint(pts: Seq[Seq[Double]], fmt: Int): String =
    "MULTIPOINT (" + pts.map(p => s"(${tup(p, fmt)})").mkString(", ") + ")"

  def dumpLineString(pts: Seq[Seq[Double]], fmt: Int): String =
    "LINESTRING (" + pts.map(tup(_, fmt)).mkString(", ") + ")"

  def dumpMultiLineString(lines: Seq[Seq[Seq[Double]]], fmt: Int): String =
    "MULTILINESTRING (" +
      lines.map(l => s"(${l.map(tup(_, fmt)).mkString(", ")})").mkString(", ") + ")"

  def dumpPolygon(rings: Seq[Seq[Seq[Double]]], fmt: Int): String =
    "POLYGON (" +
      rings.map(r => s"(${r.map(tup(_, fmt)).mkString(", ")})").mkString(", ") + ")"

  def dumpMultiPolygon(polys: Seq[Seq[Seq[Seq[Double]]]], fmt: Int): String =
    "MULTIPOLYGON (" + polys.map { p =>
      s"(${p.map(r => s"(${r.map(tup(_, fmt)).mkString(", ")})").mkString(", ")})"
    }.mkString(", ") + ")"

  /** `geojson2wkt` dispatch over our geometry model (reference
    * R/geojson2wkt.R:138-148, GC recursion :200-206). */
  def write(g: Geom, fmt: Int): String = g.typeTag match {
    case GeomType.Point           => dumpPoint(g.coords(0)(0)(0), fmt)
    case GeomType.MultiPoint      => dumpMultiPoint(g.coords(0)(0), fmt)
    case GeomType.LineString      => dumpLineString(g.coords(0)(0), fmt)
    case GeomType.MultiLineString => dumpMultiLineString(g.coords(0), fmt)
    case GeomType.Polygon         => dumpPolygon(g.coords(0), fmt)
    case GeomType.MultiPolygon    => dumpMultiPolygon(g.coords, fmt)
    case GeomType.GeometryCollection =>
      "GEOMETRYCOLLECTION (" + g.parts.map(write(_, fmt)).mkString(", ") + ")"
    case other => throw new IllegalArgumentException(s"unknown typeTag $other")
  }

  // ---- constructor family (vectorized "row -> WKT"; all trim) ----

  /** `point.numeric`/`.data.frame` (reference R/point.R:52-72; strict 2-D,
    * R/point.R:54). */
  def pointWkt(pos: Seq[Double], fmt: Int): String = {
    fmtCheck(fmt)
    arityCheck(pos, "POINT", Seq(2))
    s"POINT (${tup(pos, fmt)})"
  }

  /** `multipoint.*` (reference R/multipoint.R:41-82; per-point 2-D guard,
    * R/multipoint.R:44). */
  def multiPointWkt(pts: Seq[Seq[Double]], fmt: Int): String = {
    fmtCheck(fmt)
    pts.foreach(arityCheck(_, "MULTIPOINT", Seq(2)))
    "MULTIPOINT (" + pts.map(p => s"(${tup(p, fmt)})").mkString(", ") + ")"
  }

  /** `linestring.*` (reference R/linestring.R:56-91; positions 2..4-D,
    * R/linestring.R:60). */
  def lineStringWkt(pts: Seq[Seq[Double]], fmt: Int): String = {
    fmtCheck(fmt)
    pts.foreach(arityCheck(_, "LINESTRING", Seq(2, 3, 4)))
    "LINESTRING (" + pts.map(tup(_, fmt)).mkString(", ") + ")"
  }

  /** `polygon.*` — each arg is one ring (reference R/polygon.R:61-106). */
  def polygonWkt(rings: Seq[Seq[Seq[Double]]], fmt: Int): String = {
    fmtCheck(fmt)
    "POLYGON (" +
      rings.map(r => s"(${r.map(tup(_, fmt)).mkString(", ")})").mkString(", ") + ")"
  }

  /** `multilinestring.*` (reference R/multilinestring.R:62-97). */
  def multiLineStringWkt(lines: Seq[Seq[Seq[Double]]], fmt: Int): String = {
    fmtCheck(fmt)
    "MULTILINESTRING (" +
      lines.map(l => s"(${l.map(tup(_, fmt)).mkString(", ")})").mkString(", ") + ")"
  }

  /** `multipolygon.*` (reference R/multipolygon.R:63-113). */
  def multiPolygonWkt(polys: Seq[Seq[Seq[Seq[Double]]]], fmt: Int): String = {
    fmtCheck(fmt)
    "MULTIPOLYGON (" + polys.map { p =>
      s"(${p.map(r => s"(${r.map(tup(_, fmt)).mkString(", ")})").mkString(", ")})"
    }.mkString(", ") + ")"
  }

  /** `circularstring.*` (reference R/circularstring.R:44-70). */
  def circularStringWkt(pts: Seq[Seq[Double]], fmt: Int): String = {
    fmtCheck(fmt)
    "CIRCULARSTRING (" + pts.map(tup(_, fmt)).mkString(", ") + ")"
  }

  /** `geometrycollection.character` (reference R/geometrycollection.R:37-49):
    * validates each input WKT with the strict lint grammar; throws with the
    * reference's message on failure. */
  def geometryCollectionWkt(wkts: Seq[String]): String = {
    if (!wkts.forall(Lint.lint)) {
      throw new IllegalArgumentException("All inputs must be WKT strings")
    }
    "GEOMETRYCOLLECTION (" + wkts.mkString(", ") + ")"
  }

  /** `<type>("empty")` -> "<TYPE> EMPTY" (reference R/point.R:43-47 et al). */
  def emptyWkt(typeName: String): String = typeName.toUpperCase + " EMPTY"
}
