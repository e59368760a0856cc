package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** WKB codec matching the wkx encoding the reference embeds
  * (reference R/wkb.R:41-52 calls into inst/js/wkx.js):
  *  - little-endian, type codes Point=1 .. GeometryCollection=7
  *    (inst/js/wkx.js:1948-1956);
  *  - Z adds +1000, M +2000, ZM +3000 (inst/js/wkx.js:428-447);
  *  - child geometries of multi-geometries and collections are full WKB values with
  *    their own endian byte + type;
  *  - an empty Point serializes as an empty MULTIPOINT (inst/js/wkx.js:1560-1567).
  *
  * The reader also accepts big-endian input and the EWKB-style Z/M high-bit
  * flags (inst/js/wkx.js:214-250).
  */
object Wkb {

  // ---------- writer ----------

  def toWkb(g: Geom): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeGeom(out, g)
    out.toByteArray
  }

  private def writeGeom(out: java.io.ByteArrayOutputStream, g: Geom): Unit = {
    out.write(1) // little endian
    val dimAdd = g.dim match {
      case 3 => 1000
      case 4 => 3000
      case _ => 0
    }
    g.typeTag match {
      case GeomType.Point =>
        val pos = g.coords(0)(0)(0)
        if (pos.isEmpty) {
          writeU32(out, GeomType.MultiPoint) // wkx empty-point quirk
          writeU32(out, 0)
        } else {
          writeU32(out, GeomType.Point + dimAdd)
          writePos(out, pos)
        }
      case GeomType.LineString =>
        writeU32(out, GeomType.LineString + dimAdd)
        val pts = g.coords(0)(0)
        writeU32(out, pts.length)
        pts.foreach(writePos(out, _))
      case GeomType.Polygon =>
        writeU32(out, GeomType.Polygon + dimAdd)
        val rings = g.coords(0)
        writeU32(out, rings.length)
        rings.foreach { r => writeU32(out, r.length); r.foreach(writePos(out, _)) }
      case GeomType.MultiPoint =>
        writeU32(out, GeomType.MultiPoint + dimAdd)
        val pts = g.coords(0)(0)
        writeU32(out, pts.length)
        pts.foreach(p => writeGeom(out, Geom.point(p)))
      case GeomType.MultiLineString =>
        writeU32(out, GeomType.MultiLineString + dimAdd)
        val lines = g.coords(0)
        writeU32(out, lines.length)
        lines.foreach(l => writeGeom(out, Geom.lineString(l)))
      case GeomType.MultiPolygon =>
        writeU32(out, GeomType.MultiPolygon + dimAdd)
        writeU32(out, g.coords.length)
        g.coords.foreach(p => writeGeom(out, Geom.polygon(p)))
      case GeomType.GeometryCollection =>
        writeU32(out, GeomType.GeometryCollection)
        writeU32(out, g.parts.length)
        g.parts.foreach(writeGeom(out, _))
      case other => throw new IllegalArgumentException(s"unknown typeTag $other")
    }
  }

  private def writeU32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def writePos(out: java.io.ByteArrayOutputStream, pos: Vector[Double]): Unit = {
    val bb = ByteBuffer.allocate(8 * pos.length).order(ByteOrder.LITTLE_ENDIAN)
    pos.foreach(bb.putDouble)
    out.write(bb.array())
  }

  // ---------- reader ----------

  def fromWkb(bytes: Array[Byte]): Geom = {
    val bb = ByteBuffer.wrap(bytes)
    readGeom(bb)
  }

  private def readGeom(bb: ByteBuffer): Geom = {
    val little = bb.get() != 0
    bb.order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var wkbType = bb.getInt()
    val hasSrid = (wkbType & 0x20000000) == 0x20000000
    if (hasSrid) { bb.getInt(); wkbType = wkbType & ~0x20000000 }
    var dim = 2
    var geomType = wkbType
    if ((wkbType & 0x80000000) != 0 || (wkbType & 0x40000000) != 0) {
      val z = (wkbType & 0x80000000) != 0
      val m = (wkbType & 0x40000000) != 0
      dim = 2 + (if (z) 1 else 0) + (if (m) 1 else 0)
      geomType = wkbType & 0xF
    } else if (wkbType >= 3000 && wkbType < 4000) { dim = 4; geomType = wkbType - 3000 }
    else if (wkbType >= 2000 && wkbType < 3000) { dim = 3; geomType = wkbType - 2000 }
    else if (wkbType >= 1000 && wkbType < 2000) { dim = 3; geomType = wkbType - 1000 }

    def pos(): Vector[Double] = Vector.fill(dim)(bb.getDouble())
    def n(): Int = bb.getInt()

    geomType match {
      case GeomType.Point => Geom.point(pos())
      case GeomType.LineString => Geom.lineString(Vector.fill(n())(pos()))
      case GeomType.Polygon =>
        Geom.polygon(Vector.fill(n())(Vector.fill(n())(pos())))
      case GeomType.MultiPoint =>
        val cnt = n()
        Geom.multiPoint(Vector.fill(cnt) {
          val child = readGeom(bb)
          bb.order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
          child.coords(0)(0)(0)
        })
      case GeomType.MultiLineString =>
        val cnt = n()
        Geom.multiLineString(Vector.fill(cnt)(readGeom(bb).coords(0)(0)))
      case GeomType.MultiPolygon =>
        val cnt = n()
        Geom.multiPolygon(Vector.fill(cnt)(readGeom(bb).coords(0)))
      case GeomType.GeometryCollection =>
        val cnt = n()
        Geom.collection(Vector.fill(cnt)(readGeom(bb)))
      case other => throw new IllegalArgumentException(s"WKB geometry type $other not supported")
    }
  }

  // ---------- compact WKT (wkx toWkt emulation) ----------

  /** JS Number#toString emulation for the wkx compact writer
    * (reference README.md:350-359: "POINT(-116.4 45.2)",
    * "POLYGON((100 0,101.1 0,101 1,100 0))"). */
  def jsNum(x: Double): String = {
    if (x == x.toLong.toDouble && math.abs(x) < 1e21) x.toLong.toString
    else {
      val s = java.lang.Double.toString(x)
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
  }

  /** wkx Geometry#toWkt (inst/js/wkx.js:399-431,1551-1556,775-790, ...):
    * no space after the type keyword, no space after commas, Z/M/ZM tokens. */
  def toCompactWkt(g: Geom): String = {
    val dimTok = g.dim match {
      case 3 => " Z "
      case 4 => " ZM "
      case _ => ""
    }
    def tup(p: Seq[Double]): String = p.map(jsNum).mkString(" ")
    def ring(r: Seq[Seq[Double]]): String = "(" + r.map(tup).mkString(",") + ")"
    g.typeTag match {
      case GeomType.Point =>
        val p = g.coords(0)(0)(0)
        if (p.isEmpty) "POINT EMPTY" else s"POINT$dimTok(${tup(p)})"
      case GeomType.LineString      => s"LINESTRING$dimTok${ring(g.coords(0)(0))}"
      case GeomType.MultiPoint      => s"MULTIPOINT$dimTok${ring(g.coords(0)(0))}"
      case GeomType.Polygon         => s"POLYGON$dimTok(" + g.coords(0).map(ring).mkString(",") + ")"
      case GeomType.MultiLineString => s"MULTILINESTRING$dimTok(" + g.coords(0).map(ring).mkString(",") + ")"
      case GeomType.MultiPolygon =>
        s"MULTIPOLYGON$dimTok(" + g.coords.map(p => "(" + p.map(ring).mkString(",") + ")").mkString(",") + ")"
      case GeomType.GeometryCollection =>
        "GEOMETRYCOLLECTION(" + g.parts.map(toCompactWkt).mkString(",") + ")"
      case other => throw new IllegalArgumentException(s"unknown typeTag $other")
    }
  }
}
