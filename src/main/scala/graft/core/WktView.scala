package graft.core

/** `wktview` analog (reference R/wktview.R:31-57): the reference renders a
  * WKT string as an interactive leaflet map — `wkt2geojson(x) |>
  * properties(style = list(NULL))`, centered on the geometry's centroid,
  * `setView(center, zoom)`, `addGeoJSON`. An htmlwidget cannot exist inside
  * a DataFrame, so this engine emits the equivalent SELF-CONTAINED leaflet
  * HTML document as a string column: same GeoJSON payload, same
  * centroid-centered view, same zoom default. Writing the column to disk
  * and opening it in a browser shows the reference's map.
  *
  * The template is split into named constants so the q45 SQL oracle can be
  * assembled from the SAME literals (no drift between engine and oracle).
  */
object WktView {

  val head: String =
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\"/>" +
      "<link rel=\"stylesheet\" href=\"https://unpkg.com/leaflet@1.9.4/dist/leaflet.css\"/>" +
      "<script src=\"https://unpkg.com/leaflet@1.9.4/dist/leaflet.js\"></script></head>" +
      "<body><div id=\"map\" style=\"width:100%;height:100vh\"></div><script>" +
      "var map=L.map(\"map\").setView(["
  val midZoom: String = "],"
  val midGeo: String =
    ");L.tileLayer(\"https://{s}.tile.openstreetmap.org/{z}/{x}/{y}.png\")" +
      ".addTo(map);L.geoJSON("
  val tail: String = ").addTo(map);</script></body></html>"

  /** Leaflet setView takes [lat, lng] — note the swap from the reference's
    * `center = c(longitude, latitude)` argument order (it swaps internally
    * via leaflet::setView(lng, lat)).
    *
    * Returns null when the geometry is empty (no centroid -> no view
    * center) — the same null contract as the sibling st_* expressions
    * (st_centroid), not a task-killing throw. */
  def html(g: Geom, zoom: Int): String =
    Centroid.centroid(g) match {
      case None => null
      case Some((lon, lat)) =>
        // properties(style = list(NULL)) analog: Feature with an empty style
        val feat = GeoJson.withProperties(GeoJson.toJson(g, feature = true), "{}", null)
        s"$head$lat,$lon$midZoom$zoom$midGeo$feat$tail"
    }
}
