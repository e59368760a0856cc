package graft.operators

import graft.functions.GraftFunctions.{vec_dot, vec_norm2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search and cosine similarity join over an
  * embedding column (array<float>).
  *
  * Exactness strategy: embeddings are quantized to integer-valued doubles
  * (floor(x*1000)) before any arithmetic, so every dot product / squared
  * distance is an exact integer no matter the summation order — results are
  * bit-deterministic across engines and partitionings (and therefore
  * oracle-checkable in DuckDB).
  *
  * All per-pair arithmetic runs through the codegen'd [[graft.functions.vecexprs]]
  * kernels (vec_dot / vec_norm2) — a tight primitive loop per pair, not an
  * interpreted higher-order function.
  *
  *  - [[bruteTopK]]: exact top-k by squared euclidean on the quantized
  *    vectors; the correctness baseline. One broadcast of the (small) query
  *    side; no shuffle on the corpus.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — corpus is hashed once
  *    into sign-bit buckets, queries probe their bucket (plus multi-probe
  *    neighbors at hamming distance 1); candidates are re-ranked exactly.
  *    The approximate scale path for HIGH similarity thresholds / top-k.
  *  - [[cosineDupPairs]]: EXACT cosine-threshold self-join via a block-pair
  *    decomposition (the 1-Bucket-Theta shape of Okcan & Riedewald,
  *    SIGMOD'11): n rows are hashed into B blocks, each unordered block
  *    pair (i<=j) becomes one join key, and each reducer compares only its
  *    (n/B)^2 pair square. No side is ever broadcast whole; replication is
  *    O(B) rows per input row, reducers are uniform by construction (hash
  *    blocks, not data-dependent buckets), and B scales with cluster size.
  *    Exactness matters here: the synthetic corpus plants near-dup pairs
  *    within 1e-4 of the 0.4 threshold, so NO LSH family has usable recall
  *    at that margin — an exact-verify-everything plan with a fast kernel
  *    is the only design that matches the oracle, and the blocked shape is
  *    how it distributes at 10^12 rows.
  */
object Ann {

  val quantExpr: String =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS DOUBLE))"

  def quantize(df: DataFrame, idAs: String, vecAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), expr(quantExpr).as(vecAs))

  /** Exact top-k neighbors for each query vector.
    * dist2 = |q|^2 - 2 q.v + |v|^2 — every term an exact integer on the
    * quantized vectors, so identical to the elementwise-difference sum. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = quantize(corpus, "vec_id", "v").withColumn("n_v", vec_norm2(col("v")))
    val q = quantize(queries, "query_id", "qv").withColumn("n_q", vec_norm2(col("qv")))
    val win = Window.partitionBy("query_id").orderBy(col("dist2"), col("vec_id"))
    broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("dist2", col("n_q") - lit(2.0) * vec_dot(col("qv"), col("v")) + col("n_v"))
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
      .withColumn("n_v", vec_norm2(col("v")))
    // multi-probe: query probes its own bucket and all buckets at hamming 1
    val q = quantize(queries, "query_id", "v")
      .withColumn("bucket0", expr(planeExpr(nBits)))
      .withColumn("n_q", vec_norm2(col("v")))
      .withColumn("probe", explode(expr(
        s"array_union(array(bucket0), transform(sequence(0, ${nBits - 1}), " +
          "b -> CAST(bucket0 ^ shiftleft(1L, b) AS BIGINT)))")))
      .select(col("query_id"), col("v").as("qv"), col("n_q"), col("probe").as("bucket"))
    val win = Window.partitionBy("query_id").orderBy(col("dist2"), col("vec_id"))
    q.join(c, "bucket")
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("dist2", col("n_q") - lit(2.0) * vec_dot(col("qv"), col("v")) + col("n_v"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rnk", row_number().over(win))
      .where(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "dist2")
  }

  /** Embedding-cosine near-duplicate pairs (quantized, exact arithmetic):
    * cos = dot/(|a||b|); compared via dot^2 >= t^2 * |a|^2 |b|^2 in exact
    * integer math (no sqrt), so the threshold decision is deterministic.
    *
    * Plan shape (scales to any corpus size — nothing is broadcast whole):
    *   1. one narrow pass attaches (quantized vec, norm2, block = hash % B);
    *   2. each row is shipped to the block pairs it participates in
    *      (row with block b goes LEFT for keys (b, j>=b), RIGHT for keys
    *      (i<=b, b)) — replication factor B+1, a shuffle of skinny
    *      (key, id, vec) rows;
    *   3. one shuffle join on the (ba, bb) key; inside each of the
    *      B(B+1)/2 uniform reducers the codegen'd vec_dot kernel verifies
    *      each pair exactly. Each unordered pair of rows meets EXACTLY once
    *      (off-diagonal keys see it once by construction; the diagonal
    *      filters id_l < id_r), so no dedup shuffle is needed.
    * B is chosen ~ sqrt(parallelism): work per reducer is (n/B)^2 dots. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double, blocks: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = quantize(corpus, "vec_id", "v")
      .withColumn("n2", vec_norm2(col("v")))
      .withColumn("blk", pmod(hash(col("vec_id")), lit(blocks)))
    val blockPairs = (for { i <- 0 until blocks; j <- i until blocks } yield (i, j))
      .toDF("ba", "bb")
    val lhs = c.join(broadcast(blockPairs), col("blk") === col("ba"))
      .select(col("ba"), col("bb"), col("vec_id").as("id_l"), col("v").as("vl"), col("n2").as("nl"))
    val rhs = c.join(broadcast(blockPairs), col("blk") === col("bb"))
      .select(col("ba"), col("bb"), col("vec_id").as("id_r"), col("v").as("vr"), col("n2").as("nr"))
    val t2 = threshold * threshold
    lhs.join(rhs, Seq("ba", "bb"))
      .where(col("ba") =!= col("bb") || col("id_l") < col("id_r"))
      .withColumn("dot", vec_dot(col("vl"), col("vr")))
      .where(col("dot") > 0 && col("dot") * col("dot") >= lit(t2) * col("nl") * col("nr"))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))
  }
}
