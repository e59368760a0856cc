package graft.operators

import graft.core.CellIndex
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact kNN via expanding k-ring search over the cell grid (north_rule:
  * "kNN via expanding H3 k-ring search").
  *
  * Each round r joins the still-pending queries' disk(r) cells against the
  * (pre-celled) point table, takes per-query top-k by exact euclidean
  * distance, and retires a query once its kth distance is <= r * cellHeight
  * — no point outside the disk can beat it (a cell at Chebyshev distance
  * > r is at least r full cells away). Radius doubles per round, so rounds
  * = O(log gridSize) even for isolated queries.
  *
  * Distance is squared euclidean in lon/lat degrees with a fixed expression
  * shape so the DuckDB oracle reproduces the exact doubles; ties break on
  * point_id — fully deterministic output.
  *
  * Scale: the query side is tiny relative to the corpus (typical kNN
  * workload), so each round broadcasts the exploded query-cells; the big
  * point table is scanned with a cell-bucket filter pushed down. Pending
  * queries shrink geometrically.
  */
object Knn {

  val distExpr = "(qlon - lon) * (qlon - lon) + (qlat - lat) * (qlat - lat)"

  /** queries(query_id, qlon, qlat) x points(point_id, lon, lat) -> top-k
    * (query_id, point_id, rnk). */
  def knn(queries: DataFrame, points: DataFrame, k: Int, level: Int = 8): DataFrame = {
    val spark = queries.sparkSession
    val cellH = 180.0 / (1L << level).toDouble
    val maxR = (1L << level).toInt

    val pts = points.withColumn("cell", st_cellid(col("lon"), col("lat"), level))

    var pending = queries.cache()
    var results: DataFrame = null
    var r = 1
    val win = Window.partitionBy("query_id").orderBy(col("dist"), col("point_id"))

    while (r <= 2 * maxR && pending.limit(1).count() > 0) {
      // disk of radius r = rings 0..r, exploded per pending query
      val disk = pending.withColumn("rr", explode(sequence(lit(0), lit(math.min(r, maxR)))))
        .withColumn("cell", explode(st_ring_cells(col("qlon"), col("qlat"), level, col("rr"))))
        .drop("rr")

      val cand = broadcast(disk).join(pts, "cell")
        .withColumn("dist", expr(distExpr))
      val ranked = cand
        .withColumn("rnk", row_number().over(win))
        .where(col("rnk") <= k)
        .select("query_id", "point_id", "rnk", "dist")
        .cache()

      val bound = r * cellH
      val done = ranked.groupBy("query_id")
        .agg(count(lit(1)).as("cnt"), max(col("dist")).as("kth"))
        .where(col("cnt") === k && col("kth") <= lit(bound * bound))
        .select("query_id")

      val finished = ranked.join(done, "query_id").select("query_id", "point_id", "rnk")
      results = if (results == null) finished else results.unionByName(finished)
      // materialize results before pending shrinks (avoid recompute churn)
      results = results.cache()
      results.count()

      pending = pending.join(done, Seq("query_id"), "left_anti").cache()
      r *= 2
    }

    // any stragglers (fewer than k points in the whole grid): brute force
    if (pending.limit(1).count() > 0) {
      val brute = broadcast(pending).crossJoin(points)
        .withColumn("dist", expr(distExpr))
        .withColumn("rnk", row_number().over(win))
        .where(col("rnk") <= k)
        .select("query_id", "point_id", "rnk")
      results = if (results == null) brute else results.unionByName(brute)
    }
    results
  }

  /** Brute-force oracle-shaped variant (used by tests and as the fallback). */
  def knnBrute(queries: DataFrame, points: DataFrame, k: Int): DataFrame = {
    val win = Window.partitionBy("query_id").orderBy(col("dist"), col("point_id"))
    broadcast(queries).crossJoin(points)
      .withColumn("dist", expr(distExpr))
      .withColumn("rnk", row_number().over(win))
      .where(col("rnk") <= k)
      .select("query_id", "point_id", "rnk")
  }
}
