package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation at 100 TB scale.
  * Every variant is a pure DataFrame pipeline: exact dedup is one
  * hash-groupBy shuffle; the near-dup variants bound candidate generation
  * with LSH bucketing so the expensive pairwise verify only runs inside
  * buckets (never all-pairs).
  */
object Dedup {

  /** Exact dedup on a key column: keeps the smallest id per key.
    * One shuffle (partial-agg map side combine applies). */
  def exactKeep(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dupes"))

  /** Exact-duplicate removal: retains one row per key (deterministic:
    * smallest id wins). */
  def dropExact(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** MinHash+LSH near-duplicate candidate pairs above a Jaccard estimate
    * threshold: shingle -> minhash signature -> band-bucket join -> verify
    * with the signature agreement rate (unbiased Jaccard estimator).
    *
    * Scale shape: explode by `bands` band keys, self-join on (band, bucket)
    * — only colliding docs meet; signature verify is a zip-compare, no
    * original text needed after the signature pass. */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleW: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val withBands = df.select(col(idCol).as("id"),
        minhash(col(textCol), numHashes, shingleW).as("sig"))
      .select(col("id"), col("sig"), posexplode(lsh_bands(col("sig"), bands)).as(Seq("band_idx", "bucket")))
    val a = withBands.select(col("id").as("id_a"), col("sig").as("sig_a"), col("band_idx"), col("bucket"))
    val b = withBands.select(col("id").as("id_b"), col("sig").as("sig_b"), col("band_idx"), col("bucket"))
    a.join(b, Seq("band_idx", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / lit(numHashes))
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash near-dup pairs: bucket by the 4 16-bit sub-bands (any pair at
    * hamming distance <= 3 shares at least one exact sub-band — pigeonhole),
    * verify by full hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
      .withColumn("band_idx", explode(sequence(lit(0), lit(3))))
      .withColumn("bucket", expr("(sig >> (band_idx * 16)) & 65535"))
    val a = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"), col("band_idx"), col("bucket"))
    val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"), col("band_idx"), col("bucket"))
    a.join(b, Seq("band_idx", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming_dist(col("sig_a"), col("sig_b")))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact word-set Jaccard similar pairs via token inverted index
    * (explode distinct tokens -> equi-join -> intersection counts).
    * `minTokenLen` prunes stop-word-like hub tokens to bound fan-out. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, minTokenLen: Int = 0): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        array_distinct(split(col(textCol), " ")).as("toks"))
      .withColumn("toks", expr(s"filter(toks, t -> length(t) >= $minTokenLen)"))
      .withColumn("sz", size(col("toks")))
    val inv = toks.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
    val inter = inv.as("a").join(inv.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
