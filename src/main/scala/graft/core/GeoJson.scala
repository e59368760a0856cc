package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** GeoJSON codec for the geometry model, mirroring the reference's
  * `wkt2geojson` output shape (reference R/wkt2geojson.R:93,220-227 —
  * optional Feature wrap; GeometryCollection members inherit the feature
  * flag, R/wkt2geojson.R:199-204) and the `geojson2wkt` JSON input path
  * (reference R/geojson2wkt.R:129-136).
  *
  * Numbers serialize as shortest-form JS-style numerals; the `numeric=FALSE`
  * variant renders coordinates as "%.{fmt}f" strings
  * (`format_num`, reference R/wkt2geojson.R:117-119).
  */
object GeoJson {
  private val mapper = new ObjectMapper()

  private def coordNode(v: Double, numeric: Boolean, fmt: Int): com.fasterxml.jackson.databind.JsonNode =
    if (numeric) mapper.getNodeFactory.numberNode(v)
    else mapper.getNodeFactory.textNode(RFormat.formatNum(v, fmt))

  private def posNode(p: Seq[Double], numeric: Boolean, fmt: Int): ArrayNode = {
    val a = mapper.createArrayNode()
    p.foreach(v => a.add(coordNode(v, numeric, fmt)))
    a
  }

  /** Geometry (no feature wrap) -> Jackson node. */
  def geometryNode(g: Geom, numeric: Boolean = true, fmt: Int = 16, feature: Boolean = true): ObjectNode = {
    val o = mapper.createObjectNode()
    g.typeTag match {
      case GeomType.GeometryCollection =>
        o.put("type", "GeometryCollection")
        val arr = mapper.createArrayNode()
        // sub-geometries inherit the feature flag (reference quirk,
        // R/wkt2geojson.R:199-204)
        g.parts.foreach(p => arr.add(node(p, feature, numeric, fmt)))
        o.set[ObjectNode]("geometries", arr)
      case t =>
        o.put("type", GeomType.names(t))
        val cNode = t match {
          case GeomType.Point           => posNode(g.coords(0)(0)(0), numeric, fmt)
          case GeomType.MultiPoint | GeomType.LineString =>
            val a = mapper.createArrayNode()
            g.coords(0)(0).foreach(p => a.add(posNode(p, numeric, fmt)))
            a
          case GeomType.Polygon | GeomType.MultiLineString =>
            val a = mapper.createArrayNode()
            g.coords(0).foreach { r =>
              val rn = mapper.createArrayNode()
              r.foreach(p => rn.add(posNode(p, numeric, fmt)))
              a.add(rn)
            }
            a
          case GeomType.MultiPolygon =>
            val a = mapper.createArrayNode()
            g.coords.foreach { poly =>
              val pn = mapper.createArrayNode()
              poly.foreach { r =>
                val rn = mapper.createArrayNode()
                r.foreach(p => rn.add(posNode(p, numeric, fmt)))
                pn.add(rn)
              }
              a.add(pn)
            }
            a
          case other => throw new IllegalArgumentException(s"unknown typeTag $other")
        }
        o.set[ObjectNode]("coordinates", cNode)
    }
    o
  }

  /** Feature-or-geometry node (`iffeat`, reference R/wkt2geojson.R:220-227;
    * a GeometryCollection itself is never wrapped, only its members). */
  def node(g: Geom, feature: Boolean, numeric: Boolean = true, fmt: Int = 16): ObjectNode = {
    if (feature && g.typeTag != GeomType.GeometryCollection) {
      val f = mapper.createObjectNode()
      f.put("type", "Feature")
      f.set[ObjectNode]("geometry", geometryNode(g, numeric, fmt, feature))
      f
    } else geometryNode(g, numeric, fmt, feature)
  }

  /** `as_json(wkt2geojson(wkt))` analog. */
  def toJson(g: Geom, feature: Boolean = true, numeric: Boolean = true,
             fmt: Int = 16, pretty: Boolean = false): String = {
    val n = node(g, feature, numeric, fmt)
    if (pretty) mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
    else mapper.writeValueAsString(n)
  }

  // ---------- reader (geojson2wkt JSON input path) ----------

  private def parsePos(n: com.fasterxml.jackson.databind.JsonNode): Vector[Double] =
    n.elements().asScala.map(_.asDouble()).toVector

  private def rank2(n: com.fasterxml.jackson.databind.JsonNode): Vector[Vector[Double]] =
    n.elements().asScala.map(parsePos).toVector

  private def rank3(n: com.fasterxml.jackson.databind.JsonNode): Vector[Vector[Vector[Double]]] =
    n.elements().asScala.map(rank2).toVector

  /** Parse a GeoJSON geometry / Feature / bare "type"+"coordinates" object. */
  def parse(json: String): Geom = fromNode(mapper.readTree(json))

  def fromNode(n0: com.fasterxml.jackson.databind.JsonNode): Geom = {
    val n = if (n0.has("geometry")) n0.get("geometry") else n0
    val typ = Option(n.get("type")).map(_.asText().toLowerCase)
      .getOrElse(throw new IllegalArgumentException("GeoJSON object has no type"))
    typ match {
      case "point" =>
        val c = n.get("coordinates")
        // tolerate both [x,y] and [[x,y]]-style scalars-in-list
        val pos = if (c.size() > 0 && c.get(0).isArray) parsePos(c.get(0)) else parsePos(c)
        Geom.point(pos)
      case "multipoint"      => Geom.multiPoint(rank2(n.get("coordinates")))
      case "linestring"      => Geom.lineString(rank2(n.get("coordinates")))
      case "polygon"         => Geom.polygon(rank3(n.get("coordinates")))
      case "multilinestring" => Geom.multiLineString(rank3(n.get("coordinates")))
      case "multipolygon" =>
        Geom.multiPolygon(n.get("coordinates").elements().asScala.map(rank3).toVector)
      case "geometrycollection" =>
        Geom.collection(n.get("geometries").elements().asScala.map(fromNode).toVector)
      case other => throw new IllegalArgumentException(s"unknown GeoJSON type $other")
    }
  }

  /** `properties(x, style, popup)` (reference R/properties.R:12-22). */
  def withProperties(featureJson: String, styleJson: String, popupJson: String): String = {
    if ((styleJson == null || styleJson.isEmpty) && (popupJson == null || popupJson.isEmpty))
      throw new IllegalArgumentException(
        "You must supply a list of named options to either style, popup, or both")
    val root = mapper.readTree(featureJson).asInstanceOf[ObjectNode]
    val props = mapper.createObjectNode()
    if (styleJson != null && styleJson.nonEmpty) props.set[ObjectNode]("style", mapper.readTree(styleJson))
    if (popupJson != null && popupJson.nonEmpty) props.set[ObjectNode]("popup", mapper.readTree(popupJson))
    root.set[ObjectNode]("properties", props)
    mapper.writeValueAsString(root)
  }

  /** `as_featurecollection(x)` (reference R/as_featurecollection.R:13-18). */
  def asFeatureCollection(featureJson: String): String = {
    val feat = mapper.readTree(featureJson).asInstanceOf[ObjectNode]
    if (!feat.has("properties")) feat.set[ObjectNode]("properties", mapper.createObjectNode())
    val fc = mapper.createObjectNode()
    fc.put("type", "FeatureCollection")
    val arr = mapper.createArrayNode()
    arr.add(feat)
    fc.set[ObjectNode]("features", arr)
    mapper.writeValueAsString(fc)
  }
}
