package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Exactness strategy: embeddings are quantized to integer-valued doubles
  * (floor(x*1000)) before any arithmetic, so every dot product / squared
  * distance is an exact integer no matter the summation order — results are
  * bit-deterministic across engines and partitionings (and therefore
  * oracle-checkable in DuckDB).
  *
  *  - [[bruteTopK]]: exact top-k by squared euclidean on the quantized
  *    vectors; the correctness baseline. One broadcast of the (small) query
  *    side; no shuffle on the corpus.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — corpus is hashed once
  *    into sign-bit buckets, queries probe their bucket (plus multi-probe
  *    neighbors at hamming distance 1); candidates are re-ranked exactly.
  *    This is the 100 TB path: bucket join instead of cross join.
  */
object Ann {

  val quantExpr: String = "transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000.0))"

  private val dist2Expr: String =
    "aggregate(zip_with(qv, v, (x, y) -> (x - y) * (x - y)), 0.0D, (acc, d) -> acc + d)"

  def quantize(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), expr(quantExpr).as(vecAs))

  /** Exact top-k neighbors for each query vector. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = quantize(corpus, "vec_id", "v")
    val q = quantize(queries, "query_id", "qv")
    val win = Window.partitionBy("query_id").orderBy(col("dist2"), col("vec_id"))
    broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("dist2", expr(dist2Expr))
      .withColumn("rnk", row_number().over(win))
      .where(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "dist2")
  }

  /** Deterministic pseudo-random hyperplane for LSH: component j of plane p
    * derived from a seeded integer mix, in {-1, 0, 1} (sparse planes). */
  private def planeExpr(nBits: Int): String = {
    // sign bits: bit p = (sum_j v[j] * w(p, j)) >= 0, w in {-1,0,1} from a mix
    val bits = (0 until nBits).map { p =>
      s"""IF(aggregate(zip_with(v, sequence(0, size(v) - 1),
         |  (x, j) -> x * CAST(pmod(hash(j * 131071 + $p * 524287), 3) - 1 AS DOUBLE)),
         |  0.0D, (acc, d) -> acc + d) >= 0.0D, ${1L << p}L, 0L)""".stripMargin
    }
    bits.mkString(" + ")
  }

  /** LSH-bucketed top-k: exact re-rank inside candidate buckets. Recall is
    * tunable via nBits (fewer bits = bigger buckets = higher recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8): DataFrame = {
    val c = quantize(corpus, "vec_id", "v").withColumn("bucket", expr(planeExpr(nBits)))
    // multi-probe: query probes its own bucket and all buckets at hamming 1
    val q = quantize(queries, "query_id", "v")
      .withColumn("bucket0", expr(planeExpr(nBits)))
      .withColumn("probe", explode(expr(
        s"array_union(array(bucket0), transform(sequence(0, ${nBits - 1}), " +
          "b -> CAST(bucket0 ^ shiftleft(1L, b) AS BIGINT)))")))
      .select(col("query_id"), col("v").as("qv"), col("probe").as("bucket"))
    val win = Window.partitionBy("query_id").orderBy(col("dist2"), col("vec_id"))
    q.join(c, "bucket")
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("dist2", expr(dist2Expr))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rnk", row_number().over(win))
      .where(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "dist2")
  }

  /** Embedding-cosine near-duplicate pairs (quantized, exact arithmetic):
    * cos = dot/(|a||b|); compared via dot^2 >= t^2 * |a|^2 |b|^2 in exact
    * integer math (no sqrt), so the threshold decision is deterministic. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val c = quantize(corpus, "vec_id", "v")
      .withColumn("norm2", expr("aggregate(transform(v, x -> x * x), 0.0D, (acc, d) -> acc + d)"))
    val a = c.select(col("vec_id").as("id_a"), col("v").as("qv"), col("norm2").as("n_a"))
    val b = c.select(col("vec_id").as("id_b"), col("v").as("v"), col("norm2").as("n_b"))
    val t2 = threshold * threshold
    broadcast(a).crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .withColumn("dot", expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0.0D, (acc, d) -> acc + d)"))
      .where(col("dot") > 0 && col("dot") * col("dot") >= lit(t2) * col("n_a") * col("n_b"))
      .select("id_a", "id_b")
  }
}
