package graft.core

/** Tolerant WKT parser reproducing the reference's `wkt2geojson` loader
  * semantics exactly (reference R/wkt2geojson.R:82-227), including its
  * malformed-input tolerance contract (reference tests/testthat/
  * test-wkt2geojson.R:48-70):
  *   - case-insensitive keyword, no space before '(' ok, trailing spaces ok,
  *     runs of spaces between coords ok, missing closing paren ok;
  *   - MULTIPOINT accepts both ((1 2),(3 4)) and bare (1 2, 3 4);
  *   - MULTILINESTRING lines may be separated by ")(" as well as "),";
  *   - unknown/misspelled keyword -> error (R: "EXPR must be a length 1
  *     vector"); we throw IllegalArgumentException;
  *   - GEOMETRYCOLLECTION slices the body at the FIRST occurrence of each
  *     type keyword (uppercase, as the reference's case-sensitive regexpr),
  *     reproducing its single-occurrence-per-type contract.
  */
object WktParser {

  /** The reference's keyword table, reference R/wkt2geojson.R:96-98. */
  val types: Vector[String] = Vector(
    "POINT", "MULTIPOINT", "POLYGON", "MULTIPOLYGON",
    "LINESTRING", "MULTILINESTRING", "GEOMETRYCOLLECTION",
    "TRIANGLE", "CIRCULARSTRING", "COMPOUNDCURVE")

  /** `get_type` (reference R/wkt2geojson.R:100-107): substring scan over the
    * keyword table; when several match (POINT within MULTIPOINT), keep those
    * containing the string's first word. Returns canonical UPPERCASE names. */
  def getType(s: String, ignoreCase: Boolean): Vector[String] = {
    val hay = if (ignoreCase) s.toUpperCase else s
    val cand = types.filter(hay.contains(_))
    if (cand.length <= 1) cand
    else {
      val firstWord = {
        val m = java.util.regex.Pattern.compile("[A-Za-z]+").matcher(s)
        if (m.find()) m.group() else ""
      }
      val fw = firstWord.toUpperCase
      cand.filter(_.contains(fw))
    }
  }

  private def trim(s: String): String = s.replaceAll("^\\s+|\\s+$", "")

  /** Strip the type keyword (case-insensitive, plus one optional following
    * space — R `gsub("KEYWORD\\s?", "", ignore.case=TRUE)`). */
  private def stripKeyword(s: String, kw: String): String =
    s.replaceAll("(?i)" + kw + "\\s?", "")

  /** Strip exactly one leading '(' and one trailing ')' (R `gsub("^\\(|\\)$", "")`). */
  private def stripOuter(s: String): String =
    s.replaceAll("^\\(", "").replaceAll("\\)$", "")

  private def noParens(s: String): String = s.replaceAll("[()]", "")

  private def toDouble(tok: String): Double =
    try tok.toDouble
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"invalid WKT coordinate: '$tok'")
    }

  /** Split "x y [z [m]]" into a position (R strsplit on \\s + nozero). */
  private def position(s: String): Vector[Double] =
    s.split("\\s+").iterator.filter(_.nonEmpty).map(toDouble).toVector

  /** One chunk -> positions: remove parens, split on commas, whitespace-split. */
  private def chunkPositions(chunk: String): Vector[Vector[Double]] =
    noParens(chunk).split(",", -1).iterator
      .map(p => position(trim(p))).filter(_.nonEmpty).toVector

  def loadPoint(str: String): Geom = {
    // R: gsub("POINT|\\(|\\)", "", ignore.case) -> trim -> drop ONE trailing
    // punctuation char -> split on whitespace (reference R/wkt2geojson.R:109-115)
    val s0 = str.replaceAll("(?i)POINT|\\(|\\)", "")
    val s1 = trim(s0).replaceAll("\\p{Punct}$", "")
    Geom.point(position(s1))
  }

  def loadMultiPoint(str: String): Geom = {
    val body = stripOuter(trim(stripKeyword(str, "MULTIPOINT")))
    val chunks = body.split("\\),")
    Geom.multiPoint(chunks.iterator.flatMap(c => chunkPositions(trim(c))).toVector)
  }

  def loadLineString(str: String): Geom = {
    val body = stripOuter(trim(stripKeyword(str, "LINESTRING")))
    val first = body.split("\\),").headOption.getOrElse("")
    Geom.lineString(chunkPositions(trim(first)))
  }

  def loadPolygon(str: String): Geom = {
    val body = stripOuter(trim(stripKeyword(str, "POLYGON")))
    val rings = body.split("\\),").iterator.map(r => chunkPositions(trim(r))).toVector
    Geom.polygon(rings)
  }

  def loadMultiLineString(str: String): Geom = {
    val body = stripOuter(trim(stripKeyword(str, "MULTILINESTRING")))
    // reference R/wkt2geojson.R:183 splits on "\\),|\\)\\(" — tolerates ")(".
    val lines = body.split("\\),|\\)\\(").iterator.map(l => chunkPositions(trim(l))).toVector
    Geom.multiLineString(lines)
  }

  def loadMultiPolygon(str: String): Geom = {
    val noNl = str.replace("\n", "")
    val body = stripOuter(trim(stripKeyword(noNl, "MULTIPOLYGON")))
    val polys = body.split("\\)\\),").iterator.map { p =>
      trim(p).split("\\),").iterator.map(r => chunkPositions(trim(r))).toVector
    }.toVector
    Geom.multiPolygon(polys)
  }

  def loadGeometryCollection(str: String): Geom = {
    val noNl = str.replace("\n", "")
    val body = stripOuter(trim(stripKeyword(noNl, "GEOMETRYCOLLECTION")))
    // first occurrence of each keyword, case-SENSITIVE like the reference's
    // regexpr over uppercase `types` (R/wkt2geojson.R:197)
    val matches = types.iterator
      .map(t => t -> body.indexOf(t))
      .filter(_._2 >= 0).toVector
      .sortBy(_._2)
    val parts = matches.indices.map { i =>
      val (kw, start) = matches(i)
      val end = if (i == matches.length - 1) body.length else matches(i + 1)._2
      val slice = body.substring(start, end)
      dispatch(kw, slice)
    }.toVector
    Geom.collection(parts)
  }

  private def dispatch(kw: String, slice: String): Geom = kw match {
    case "POINT"              => loadPoint(slice)
    case "MULTIPOINT"         => loadMultiPoint(slice)
    case "LINESTRING"         => loadLineString(slice)
    case "MULTILINESTRING"    => loadMultiLineString(slice)
    case "POLYGON"            => loadPolygon(slice)
    case "MULTIPOLYGON"       => loadMultiPolygon(slice)
    case "GEOMETRYCOLLECTION" => loadGeometryCollection(slice)
    case other =>
      throw new IllegalArgumentException(s"no WKT loader for type $other")
  }

  /** Zero-regex fast path for the hot case (POINT footprints at web scale):
    * hand-rolled scan that accepts exactly the inputs whose tolerant-path
    * result it reproduces — keyword (any case), optional parens/whitespace,
    * 2..4 plain numeric tokens, optional trailing commas. Anything else
    * (letters, interior commas, exponents-with-letters ambiguity) returns
    * null and the caller falls back to the R-faithful slow path. */
  private def fastPoint(s: String): Geom = {
    val n = s.length
    var i = 0
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    if (i + 5 > n) return null
    var k = 0
    while (k < 5) {
      if (Character.toUpperCase(s.charAt(i + k)) != "POINT".charAt(k)) return null
      k += 1
    }
    i += 5
    val coords = new Array[Double](4)
    var cnt = 0
    var tokStart = -1
    var sawComma = false
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      val isNumChar = (c >= '0' && c <= '9') || c == '.' || c == '+' || c == '-'
      if (isNumChar) {
        if (sawComma) return null // token after comma: not a simple point
        if (tokStart < 0) tokStart = i
      } else {
        if (tokStart >= 0) {
          if (cnt >= 4) return null
          try coords(cnt) = java.lang.Double.parseDouble(s.substring(tokStart, i))
          catch { case _: NumberFormatException => return null }
          cnt += 1
          tokStart = -1
        }
        if (c == ',') sawComma = true
        else if (!(c == '(' || c == ')' || Character.isWhitespace(c))) return null
      }
      i += 1
    }
    if (cnt < 2) return null
    Geom.point(Vector.tabulate(cnt)(coords(_)))
  }

  /** `<TYPE> EMPTY` -> coordinate-free geometry of that type (the reference
    * tolerates EMPTY bodies — as.numeric("EMPTY") -> NA — and its own
    * constructors emit them, reference R/point.R:43-47; this also closes the
    * round trip with the compact writer's "POINT EMPTY"). */
  private def emptyGeom(kw: String): Geom = kw match {
    case "POINT"              => Geom(GeomType.Point, Vector(Vector(Vector(Vector.empty))))
    case "LINESTRING"         => Geom.lineString(Vector.empty)
    case "POLYGON"            => Geom.polygon(Vector.empty)
    case "MULTIPOINT"         => Geom.multiPoint(Vector.empty)
    case "MULTILINESTRING"    => Geom.multiLineString(Vector.empty)
    case "MULTIPOLYGON"       => Geom.multiPolygon(Vector.empty)
    case "GEOMETRYCOLLECTION" => Geom.collection(Vector.empty)
    case other =>
      throw new IllegalArgumentException(s"no WKT loader for type $other")
  }

  /** `wkt2geojson` dispatch (reference R/wkt2geojson.R:82-94). */
  def parse(wkt: String): Geom = {
    val fp = fastPoint(wkt)
    if (fp != null) return fp
    val t = getType(wkt, ignoreCase = true)
    if (t.length != 1)
      throw new IllegalArgumentException(
        "EXPR must be a length 1 vector: unknown or ambiguous WKT type in: " + wkt)
    if (trim(stripKeyword(wkt, t.head)).equalsIgnoreCase("EMPTY")) emptyGeom(t.head)
    else dispatch(t.head, wkt)
  }

  def parseOrNull(wkt: String): Geom =
    try parse(wkt) catch { case _: IllegalArgumentException => null }
}
