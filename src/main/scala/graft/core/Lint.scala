package graft.core

import java.util.regex.Pattern

/** Strict WKT validation — a faithful port of the reference's regex grammar
  * (reference R/lint.R:24-136), preserving its quirks:
  *
  *  - keywords and EMPTY are effectively UPPERCASE-only: the type is detected
  *    case-insensitively but then removed case-SENSITIVELY
  *    (R `gsub(toupper(type), "", str)`, R/lint.R:26-27), so lowercase input
  *    never matches the body rules (tests/testthat/test-lint.R:23,56-58);
  *  - MULTIPOINT accepts only the wrapped `((1 2), (3 4))` form (R/lint.R:102);
  *  - POLYGON with holes passes, MULTIPOLYGON with holes FAILS (known gap,
  *    pinned at tests/testthat/test-lint.R:104);
  *  - MULTILINESTRING and GEOMETRYCOLLECTION have no rule -> vacuously TRUE
  *    (R `all(NULL)`, R/lint.R:28-38);
  *  - CIRCULARSTRING accepts any point count >= 1 (fixme noted R/lint.R:183).
  */
object Lint {

  // nouns (reference R/lint.R:60-93); [[:space:]] == Java \s
  private val number = "[+-]?(\\d*\\.)?\\d+"
  private val space = "\\s+"
  private val spaceif = "\\s*"
  private val comma = "\\s*,\\s*"
  private val lp = "^\\(\\s*"
  private val lpI = "\\s*\\(\\s*"
  private val rp = "\\s*\\)$"
  private val rpI = "\\s*\\)\\s*"
  private val empty = "^EMPTY$"

  private def rep(x: String): String = s"($x)*"
  private def vor(xs: String*): String = xs.mkString("|")

  private val pt = number + space + number
  private val pt3 = number + space + number + space + number
  private val commapt = comma + spaceif + pt
  private val multipt = lpI + pt + rpI
  private val linestr = lpI + pt + rep(commapt) + rpI
  private val polygonstr = lpI + linestr + rpI
  private val commapolygon = comma + spaceif + polygonstr
  private val reppolygonstr = lpI + linestr + rpI + rep(commapolygon)
  private val commamultipt = comma + spaceif + multipt
  private val commalinestr = comma + spaceif + linestr
  private val commapt3 = comma + spaceif + pt3

  private val rulePoint = vor(
    empty,
    lp + pt + rp,
    lp + number + space + number + space + number + rp,
    lp + number + space + number + space + number + space + number + rp)
  private val ruleMultiPoint = vor(empty, lp + multipt + rep(commamultipt) + rp)
  private val ruleLineString = vor(
    empty,
    lp + pt + rep(commapt) + rp,
    lp + pt3 + rep(commapt3) + rp)
  private val rulePolygon = vor(empty, lp + linestr + rep(commalinestr) + rp)
  private val ruleMultiPolygon = vor(empty, lp + reppolygonstr + rp)
  private val ruleTriangle = vor(empty, lp + lpI + pt + rep(commapt) + rpI + rp)
  private val ruleCircularString = vor(empty, lp + pt + rep(commapt) + rp)
  private val ruleCompoundCurve =
    vor(empty, lp + "CIRCULARSTRING" + lpI + pt + rep(commapt) + rpI + rp)

  private val rules: Map[String, Pattern] = Map(
    "POINT" -> rulePoint,
    "LINESTRING" -> ruleLineString,
    "MULTIPOINT" -> ruleMultiPoint,
    "POLYGON" -> rulePolygon,
    "MULTIPOLYGON" -> ruleMultiPolygon,
    "TRIANGLE" -> ruleTriangle,
    "CIRCULARSTRING" -> ruleCircularString,
    "COMPOUNDCURVE" -> ruleCompoundCurve
  ).map { case (k, v) => k -> Pattern.compile(v) }

  /** `lint` (reference R/lint.R:24-38). */
  def lint(str: String): Boolean = {
    if (str == null) return false
    val t = WktParser.getType(str, ignoreCase = true)
    if (t.isEmpty) return false
    if (t.length > 1) return false // R switch on length>1 vector errors; treat as invalid
    val typ = t.head
    // case-SENSITIVE removal of the uppercase keyword, then trim
    val body = str.replace(typ, "").replaceAll("^\\s+|\\s+$", "")
    rules.get(typ) match {
      case None    => true // MULTILINESTRING / GEOMETRYCOLLECTION: vacuously valid
      case Some(p) => p.matcher(body).find()
    }
  }
}
