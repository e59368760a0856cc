package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic spatial layers derived from the driver's parquet
  * tables (TESTDATA.md) — no external data, seed-free pure integer
  * arithmetic so the SAME SQL text evaluates to bit-identical doubles in
  * Spark and in the DuckDB oracle.
  *
  * The `images`/point table mirrors BASELINE.json `input_hint` (image_id,
  * w, h, fmt, caption, phash + footprint); `bytes` (real encoded pixels) is
  * attached only where a test needs it (graft.operators.Images) because the
  * oracle cannot see binary synthesis.
  *
  * Skew is built in deliberately (north_rule: "skew handled explicitly"):
  * 20% of points and 10% of polygons land in a small hot region around the
  * origin, so hot cover cells exist at every scale.
  */
object SynthData {

  /** Point-side synth from `orders` (one point per order row).
    * Fraction .0005 keeps every point strictly off integer polygon edges. */
  val pointLonSql: String =
    "CASE WHEN o_orderkey % 5 = 0 " +
      "THEN CAST((o_orderkey * 131) % 8000 AS DOUBLE) / 1000.0 + 0.0005 " +
      "ELSE CAST((o_orderkey * 9973) % 340000 AS DOUBLE) / 1000.0 - 170.0 + 0.0005 END"
  val pointLatSql: String =
    "CASE WHEN o_orderkey % 5 = 0 " +
      "THEN CAST((o_orderkey * 197) % 6000 AS DOUBLE) / 1000.0 + 0.0005 " +
      "ELSE CAST((o_orderkey * 7919) % 160000 AS DOUBLE) / 1000.0 - 80.0 + 0.0005 END"

  /** Rectangle polygon layer from `supplier`: 10% hot (over the hot point
    * region), the rest spread over the globe. All corners integral. */
  val polyX0Sql: String =
    "CASE WHEN s_suppkey % 10 = 0 THEN CAST(s_suppkey % 7 AS DOUBLE) - 1.0 " +
      "ELSE CAST((s_suppkey * 131) % 324 AS DOUBLE) - 170.0 END"
  val polyY0Sql: String =
    "CASE WHEN s_suppkey % 10 = 0 THEN CAST(s_suppkey % 5 AS DOUBLE) - 1.0 " +
      "ELSE CAST((s_suppkey * 37) % 144 AS DOUBLE) - 80.0 END"
  val polyWSql: String = "CAST(4 + s_suppkey % 13 AS DOUBLE)"
  val polyHSql: String = "CAST(3 + s_suppkey % 11 AS DOUBLE)"

  /** kNN query points from `nation`. */
  val queryLonSql: String =
    "CAST((n_nationkey * 7127) % 340000 AS DOUBLE) / 1000.0 - 170.0 + 0.0005"
  val queryLatSql: String =
    "CAST((n_nationkey * 4231) % 160000 AS DOUBLE) / 1000.0 - 80.0 + 0.0005"

  /** DuckDB CTE snippets for the oracle side (same expressions verbatim). */
  val ptsCte: String =
    s"SELECT o_orderkey AS point_id, $pointLonSql AS lon, $pointLatSql AS lat FROM orders"
  val polysCte: String =
    s"SELECT s_suppkey AS poly_id, $polyX0Sql AS x0, $polyY0Sql AS y0, $polyWSql AS w, $polyHSql AS h FROM supplier"
  val queriesCte: String =
    s"SELECT n_nationkey AS query_id, $queryLonSql AS qlon, $queryLatSql AS qlat FROM nation"

  def points(spark: SparkSession, dir: String, widen: Boolean = true): DataFrame = {
    // widen: orders.parquet is one small file — everything derived from the
    // point layer (WKT formatting, cell explode, image synth/codecs) would
    // otherwise execute single-task above the scan (graft.ParUtil).
    // `widen = false` is for consumers whose first operation above the scan
    // is already an aggregation exchange (e.g. tile counts): there the
    // widen shuffle buys nothing and costs a full pass (guide §2.4).
    val raw = spark.read.parquet(s"$dir/orders.parquet")
    (if (widen) graft.ParUtil.widen(raw) else raw)
      .select(col("o_orderkey").as("point_id"),
        expr(pointLonSql).as("lon"), expr(pointLatSql).as("lat"))
  }

  /** Table-free point synth at arbitrary cardinality (scale benchmarks):
    * same arithmetic as [[points]] with `id` in place of o_orderkey. */
  def pointsN(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("point_id"),
      expr(pointLonSql.replace("o_orderkey", "id")).as("lon"),
      expr(pointLatSql.replace("o_orderkey", "id")).as("lat"))

  /** Rectangle layer WITH its WKT (exercises the constructor + parser in the
    * engine path; corners integral so fmt=0 round-trips exactly). */
  def polygons(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions._
    spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("poly_id"),
        expr(polyX0Sql).as("x0"), expr(polyY0Sql).as("y0"),
        expr(polyWSql).as("w"), expr(polyHSql).as("h"))
      .withColumn("wkt", st_polygon_wkt(
        array(array(
          array(col("x0"), col("y0")),
          array(col("x0") + col("w"), col("y0")),
          array(col("x0") + col("w"), col("y0") + col("h")),
          array(col("x0"), col("y0") + col("h")),
          array(col("x0"), col("y0")))), 0))
  }

  def knnQueries(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").as("query_id"),
        expr(queryLonSql).as("qlon"), expr(queryLatSql).as("qlat"))

  /** images table per input_hint (without bytes; see graft.operators.Images
    * for the pixel-bearing variant). caption + phash are deterministic. */
  def images(spark: SparkSession, dir: String): DataFrame = imagesFrom(points(spark, dir))

  /** Scale-test variant: n images with smaller pixel dims (w 16..48). */
  def imagesN(spark: SparkSession, n: Long): DataFrame =
    imagesFrom(pointsN(spark, n))
      .withColumn("w", (col("point_id") % 3 * 16 + 16).cast("int"))
      .withColumn("h", (col("point_id") % 2 * 16 + 16).cast("int"))

  /** `us_cities`-SHAPED demo fixture (reference R/wellknown-package.R:17-24:
    * name, country.etc, pop, lat, long, capital) — synthesized
    * deterministically from `nation` rather than copying the reference's
    * bundled data. Column `country_etc` stands in for R's `country.etc`
    * (dots are not valid Spark identifiers). */
  val usCitiesCte: String =
    "SELECT 'city-' || n_nationkey AS name, 'ST' || CAST(n_nationkey % 7 AS INT) AS country_etc, " +
      "CAST((n_nationkey * 7919) % 900000 + 1000 AS BIGINT) AS pop, " +
      "CAST((n_nationkey * 4231) % 24000 AS DOUBLE) / 1000.0 + 25.0 AS lat, " +
      "CAST((n_nationkey * 7127) % 57000 AS DOUBLE) / 1000.0 - 124.0 AS lon, " +
      "CAST(n_nationkey % 3 AS INT) AS capital FROM nation"

  def usCities(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
      .select(
        concat(lit("city-"), col("n_nationkey")).as("name"),
        concat(lit("ST"), (col("n_nationkey") % 7).cast("int")).as("country_etc"),
        expr("CAST((n_nationkey * 7919) % 900000 + 1000 AS BIGINT)").as("pop"),
        expr("CAST((n_nationkey * 4231) % 24000 AS DOUBLE) / 1000.0 + 25.0").as("lat"),
        expr("CAST((n_nationkey * 7127) % 57000 AS DOUBLE) / 1000.0 - 124.0").as("lon"),
        expr("CAST(n_nationkey % 3 AS INT)").as("capital"))

  def imagesFrom(pts: DataFrame): DataFrame =
    pts
      .withColumn("image_id", format_string("img-%09d", col("point_id")))
      .withColumn("w", (col("point_id") % 5 * 16 + 16).cast("int"))
      .withColumn("h", (col("point_id") % 3 * 16 + 16).cast("int"))
      .withColumn("fmt", element_at(array(lit("png"), lit("bmp"), lit("jpg")),
        (col("point_id") % 3 + 1).cast("int")))
      .withColumn("caption", concat(lit("caption for img-"), col("point_id"),
        lit(" seed 42")))
      .withColumn("phash", xxhash64(col("image_id")))
}
