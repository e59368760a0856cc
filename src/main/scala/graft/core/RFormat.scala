package graft.core

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** Emulation of R's `format(x, nsmall = fmt, trim = ...)` as used by the
  * reference WKT writers (reference: R/geojson2wkt.R:151-206, R/point.R:55,
  * R/zzz.R — every WKT the reference emits goes through this).
  *
  * Derived algorithm (evidence: reference tests/testthat/test-geojson2wkt.r:8,27,41,53
  * and test-point.R:16,31; see SURVEY.md §2.3):
  *
  *  1. For each double `x` in a coordinate tuple, round the exact binary value
  *     to 7 significant digits (R default `digits = 7`), strip trailing zeros,
  *     and count decimals needed -> d_i (floor 0).
  *  2. Tuple decimals D = max(max_i d_i, fmt).
  *  3. Render each `x` as the correctly-rounded decimal expansion of the RAW
  *     double to D places (C `%.Df` semantics = HALF_EVEN on the exact value),
  *     e.g. fmt=16: -116.4 -> "-116.4000000000000057".
  *  4. With pad=true (only `dump_point`, R/geojson2wkt.R:153 — `format` without
  *     `trim`), right-align all tuple members to the common width.
  */
object RFormat {
  // R's signif() rounds half-to-even; binary doubles essentially never tie
  // at 7 significant digits, but HALF_EVEN keeps the emulation exact.
  private val mc7 = new MathContext(7, RoundingMode.HALF_EVEN)

  /** Decimals needed to show x at 7 significant digits (R print default). */
  def decimalsFor7Sig(x: Double): Int = {
    if (x == 0.0 || java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) 0
    else {
      val bd = new JBigDecimal(x).round(mc7).stripTrailingZeros()
      math.max(0, bd.scale)
    }
  }

  /** C `%.Df`-style rendering of the raw double (exact value, HALF_EVEN ties). */
  def renderAt(x: Double, d: Int): String = {
    if (java.lang.Double.isNaN(x)) "NaN"
    else if (java.lang.Double.isInfinite(x)) (if (x > 0) "Inf" else "-Inf")
    else new JBigDecimal(x).setScale(d, RoundingMode.HALF_EVEN).toPlainString
  }

  /** Format one coordinate tuple with a shared decimal count. */
  def formatTuple(xs: Seq[Double], fmt: Int, pad: Boolean): Seq[String] = {
    if (xs.isEmpty) return Nil
    val d = math.max(fmt, xs.map(decimalsFor7Sig).max)
    val rendered = xs.map(renderAt(_, d))
    if (pad) {
      val w = rendered.map(_.length).max
      rendered.map(s => (" " * (w - s.length)) + s)
    } else rendered
  }

  /** `format_num` (reference R/wkt2geojson.R:117-119): independent `%.{fmt}f`
    * per coordinate, no 7-sig step, no tuple grouping. Used by the
    * `numeric=FALSE` GeoJSON path. */
  def formatNum(x: Double, fmt: Int): String = renderAt(x, fmt)
}
