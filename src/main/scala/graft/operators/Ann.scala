package graft.operators

import graft.functions.GraftFunctions.{vec_dot, vec_lsh_bucket, vec_norm2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** Exact top-k by COSINE similarity — the brute-force cosine baseline
    * (on L2-normalized embeddings this ordering coincides with
    * [[bruteTopK]]'s euclidean one; on unnormalized vectors they differ,
    * so both baselines ship). cos = dot / (sqrt(|q|^2) * sqrt(|v|^2)) over
    * the quantized vectors: the dot and both norms are exact integers, so
    * the IEEE result of this exact expression shape is bit-identical in
    * any engine that evaluates the same text — rank and value are
    * oracle-checkable (q53). Zero vectors have no cosine and are excluded
    * on both sides. The approximate scale path for cosine is [[lshTopK]]
    * (random-hyperplane LSH is the cosine family). */
  def bruteTopKCosine(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = quantize(corpus, "vec_id", "v").withColumn("n_v", vec_norm2(col("v")))
    val q = quantize(queries, "query_id", "qv").withColumn("n_q", vec_norm2(col("qv")))
    val win = Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))
    broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("vec_id"))
      .where(col("n_v") > 0 && col("n_q") > 0)
      .withColumn("cos",
        vec_dot(col("qv"), col("v")) / (sqrt(col("n_q")) * sqrt(col("n_v"))))
      .withColumn("rnk", row_number().over(win))
      .where(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "cos")
  }

  /** LSH-bucketed top-k: exact re-rank inside candidate buckets. Recall is
    * tunable via nBits (fewer bits = bigger buckets = higher recall). The
    * per-row bucket hash is the codegen'd [[graft.functions.vecexprs.VecLshBucket]]
    * kernel (NOT an interpreted HOF — see the round-1 postmortem in
    * BENCH/BASELINE.md). Probabilistic recall: use [[ivfTopK]] when the
    * answer must be exact with a bucketed plan. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8): DataFrame = {
    val c = quantize(corpus, "vec_id", "v")
      .withColumn("bucket", vec_lsh_bucket(col("v"), nBits))
      .withColumn("n_v", vec_norm2(col("v")))
    // multi-probe: query probes its own bucket and all buckets at hamming 1
    val q = quantize(queries, "query_id", "v")
      .withColumn("bucket0", vec_lsh_bucket(col("v"), nBits))
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

  /** Centroid count for an n-row corpus: ~4*sqrt(n), floored at 16 and
    * CAPPED at `maxCentroids` — independent of corpus size past the cap, so
    * the index-build broadcast and the per-row assignment cost stop growing
    * with n (the round-3 quadratic-at-default defect). At the 4096 default
    * the matrix is <= 2 MB of doubles for 64-dim vectors. */
  def centroidCap(n: Long, maxCentroids: Int = 4096): Int =
    math.min(math.max(16L, 4L * math.sqrt(n.toDouble).toLong), maxCentroids.toLong).toInt

  /** EXACT top-k via an IVF (inverted-file) index with triangle-inequality
    * cell pruning — the oracle-provable ANN scale path (vs [[bruteTopK]]'s
    * O(|q| * n) crossJoin and [[lshTopK]]'s probabilistic recall).
    *
    * Index: centroids are a deterministic pseudo-random sample of the
    * corpus itself — the min(4*sqrt(n), `maxCentroids`) lowest rows by
    * (hash(vec_id), vec_id), one distributed top-C pass ([[centroidCap]]).
    * Exactness never depends on WHICH centroids are chosen (the triangle
    * bound below holds for any partition of the corpus), only pruning
    * efficiency does, and a uniform hash sample tracks the data
    * distribution. Every corpus vector is assigned to its nearest centroid
    * by the NARROW [[graft.functions.vecexprs.VecNearest]] kernel (the
    * capped matrix rides inside the expression — no join, no shuffle, no
    * corpus-proportional broadcast); each cell records its radius
    * r_c = max member distance. Search:
    *
    *   phase 1 — each query probes its `nProbe` nearest cells and ranks the
    *     members found there exactly; the kth-best distance d_k (an UPPER
    *     bound on the true kth distance) comes out of the same plan;
    *   phase 2 — a cell c can contain a true top-k member only if
    *     dist(q, mu_c) - r_c <= true d_k <= phase-1 d_k (triangle
    *     inequality), so the final candidate set is exactly the members of
    *     cells passing that bound (+1e-6 slack for sqrt rounding — extra
    *     probes only). Since assignment is a partition, each (query,
    *     candidate) pair appears once: no dedup shuffle.
    *
    * Scale shape: the broadcasts are the capped centroid frame, the
    * per-query probe lists, and (default mode) the quantized QUERY frame
    * itself — queries are the small side in the service shape; pass
    * `broadcastQueries = false` for huge batches to route query vectors
    * through shuffle joins instead ([[ivfSearchWithHandle]]); the
    * corpus-side assignment is ONE
    * narrow kernel pass whose result is persisted (MEMORY_AND_DISK) so the
    * d_k and phase-2 subtrees reuse it instead of recomputing it per
    * consumer (the round-3 5x-re-execution smell); the probe join is a
    * plain equijoin on cell id. Nothing is ever all-pairs and the corpus is
    * never broadcast. Exactness has no data assumptions, so the DuckDB
    * brute-force oracle must match bit-for-bit (q41).
    *
    * Lifecycle: the two persisted intermediates (assignment, query-centroid
    * distances) back the RETURNED plan, so they cannot be unpersisted here;
    * Dataset-level persist is held by the session CacheManager until an
    * explicit `spark.catalog.clearCache()` / uncache (NOT freed by GC), so
    * one-shot jobs are unaffected but long-lived sessions should clear
    * between batches. A service issuing many query batches over one corpus should
    * build the index ONCE with [[writeIvfIndex]] and answer batches with
    * [[ivfTopKIndexed]] — no per-call count/sample/assignment work and no
    * in-memory cache to manage. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              maxCentroids: Int = 4096, nProbe: Int = 4,
              broadcastQueries: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    buildIvfAssigned(corpus, maxCentroids) match {
      case None => bruteTopK(corpus, queries, k) // empty corpus
      case Some((assigned, centVecs)) =>
        val cells = assigned.groupBy("cell").agg(max(col("dc")).as("rc"))
        val centsDf = centVecs.zipWithIndex
          .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cent_id", "cv")
        ivfSearchWithHandle(queries, assigned, cells, centsDf, k, nProbe,
          persistQc = true, broadcastQueries)._1
    }
  }

  /** Shared index build: quantize + capped deterministic centroid sample
    * (count() + one distributed top-C are the only extra actions) + ONE
    * narrow [[graft.functions.vecexprs.VecNearest]] assignment pass,
    * persisted MEMORY_AND_DISK for its consumers. None on an empty corpus. */
  private def buildIvfAssigned(corpus: DataFrame, maxCentroids: Int)
      : Option[(DataFrame, Array[Array[Double]])] = {
    val c = quantize(corpus, "vec_id", "v").withColumn("n_v", vec_norm2(col("v")))
    // ONE distributed top-maxCentroids pass doubles as the corpus-size probe:
    // when it returns fewer than maxCentroids rows, that number IS n and the
    // separate count() job is skipped (the service/bench shape); only a
    // corpus larger than the cap still pays the count to size centroidCap.
    // The retained prefix is identical to the old count-then-limit(cCap)
    // sample — same (hash(vec_id), vec_id) order, cCap <= maxCentroids.
    val capMax = math.max(1, maxCentroids)
    val sample = c
      .select(col("vec_id"), col("v"))
      .orderBy(hash(col("vec_id")), col("vec_id")).limit(capMax)
      .collect()
    if (sample.isEmpty) return None
    val n = if (sample.length < capMax) sample.length.toLong else c.count()
    val cCap = centroidCap(n, capMax)
    val centVecs: Array[Array[Double]] = sample.take(cCap)
      .map(_.getSeq[Double](1).toArray)
    val dim = centVecs.map(_.length).max
    val flat = new Array[Double](centVecs.length * dim) // short vecs zero-pad
    centVecs.zipWithIndex.foreach { case (v, i) =>
      System.arraycopy(v, 0, flat, i * dim, v.length)
    }
    val nearest = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.vecexprs.VecNearest(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("v"), flat, dim))
    val assigned = c.withColumn("nc", nearest)
      .select(col("vec_id"), col("v"), col("n_v"), col("nc.cell").as("cell"),
        sqrt(greatest(col("nc.d2"), lit(0.0))).as("dc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    Some((assigned, centVecs))
  }

  /** Build the IVF index ONCE to `path` — the repeated-query-batch shape
    * ([[Knn.writeCelledCorpus]]'s pattern for embeddings): three parquet
    * tables (`centroids` — the capped sample; `assigned` — the corpus with
    * its cell id and centroid distance, co-located by cell; `cells` — per
    * cell radii). [[ivfTopKIndexed]] then answers any number of query
    * batches against the files with no per-call count/sample/assignment
    * work and no in-memory cache to manage. */
  def writeIvfIndex(corpus: DataFrame, path: String, maxCentroids: Int = 4096): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    buildIvfAssigned(corpus, maxCentroids) match {
      case None => // empty corpus: an empty-but-readable index
        Seq.empty[(Int, Seq[Double])].toDF("cent_id", "cv")
          .write.mode("overwrite").parquet(s"$path/centroids")
        Seq.empty[(Long, Seq[Double], Double, Int, Double)]
          .toDF("vec_id", "v", "n_v", "cell", "dc")
          .write.mode("overwrite").parquet(s"$path/assigned")
        Seq.empty[(Int, Double)].toDF("cell", "rc")
          .write.mode("overwrite").parquet(s"$path/cells")
      case Some((assigned, centVecs)) =>
        // co-locate cells so probe equijoins read whole row groups per cell
        assigned.repartition(col("cell")).sortWithinPartitions("cell")
          .write.mode("overwrite").parquet(s"$path/assigned")
        assigned.groupBy("cell").agg(max(col("dc")).as("rc"))
          .write.mode("overwrite").parquet(s"$path/cells")
        assigned.unpersist(false)
        centVecs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
          .toDF("cent_id", "cv").write.mode("overwrite").parquet(s"$path/centroids")
    }
  }

  /** EXACT top-k against a prebuilt [[writeIvfIndex]] index — identical
    * output to [[ivfTopK]]/[[bruteTopK]], but the per-call cost is search
    * only (the parquet index IS the materialization; nothing is persisted
    * here by default).
    *
    * `cacheQueryDists = true` is the huge-query-batch mode: the |q| x C
    * query-centroid distance frame is persisted so both probe phases pay
    * the centroid kernel ONCE, the result is materialized eagerly
    * (localCheckpoint), and the cache is dropped before returning — so the
    * no-cache-to-manage service contract still holds (nothing stays in the
    * CacheManager), at the cost of the result being computed at call time
    * rather than lazily. Free the returned frame's blocks with
    * [[graft.ParUtil.freeCheckpoint]] when done.
    *
    * `broadcastQueries = false` routes query vectors through shuffle joins
    * instead of broadcasting the query frame — the plan for batches too
    * big for the broadcast limit (see [[ivfSearchWithHandle]]). */
  def ivfTopKIndexed(queries: DataFrame, indexPath: String, k: Int,
                     nProbe: Int = 4, cacheQueryDists: Boolean = false,
                     broadcastQueries: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val assigned = spark.read.parquet(s"$indexPath/assigned")
    val cells = spark.read.parquet(s"$indexPath/cells")
    val centsDf = spark.read.parquet(s"$indexPath/centroids")
    if (centsDf.isEmpty) { // empty index (empty corpus): zero neighbors
      import spark.implicits._
      return Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "vec_id", "rnk", "dist2")
    }
    if (!cacheQueryDists)
      // lazy plan, zero session cache: the two probe phases recompute the
      // (skinny, narrow) |q| x C distance frame — right default for a
      // long-lived service that must not accumulate one pinned RDD per call
      ivfSearchWithHandle(queries, assigned, cells, centsDf, k, nProbe,
        persistQc = false, broadcastQueries)._1
    else {
      val (plan, qc) = ivfSearchWithHandle(queries, assigned, cells, centsDf,
        k, nProbe, persistQc = true, broadcastQueries)
      val eager = plan.localCheckpoint(true) // materialize while qc is hot
      qc.foreach(_.unpersist(false))
      eager
    }
  }

  /** Search internals: `assigned(vec_id, v, n_v, cell, dc)` must be a
    * PARTITION of the corpus; `cells(cell, rc)` its radii; `centsDf
    * (cent_id, cv)` the centroid vectors (capped, hence broadcastable).
    * Returns the result plan plus the persisted |q| x C frame (when
    * `persistQc`) so a caller that eagerly materializes the result can
    * unpersist it instead of leaving it to the session CacheManager.
    *
    * Broadcast inventory (the scale contract), default mode: the capped
    * centroid frame, the per-query probe lists, AND the quantized query
    * frame itself (ids + vectors, into both rankMembers joins) — so
    * QUERIES MUST BE THE SMALL SIDE, which is the ANN service shape (query
    * batches of 10^3-10^6 against a corpus of 10^9+).
    * `broadcastQueries = false` is the LARGE-batch plan: query vectors are
    * attached to the skinny probe rows with a shuffle join on query_id and
    * ride the cell equijoin shuffle instead — nothing query-sized is ever
    * broadcast (only the capped centroid frame remains), at the cost of
    * shipping each query vector once per probe row. Identical output. */
  private def ivfSearchWithHandle(queries: DataFrame, assigned: DataFrame, cells: DataFrame,
                                  centsDf: DataFrame, k: Int, nProbe: Int,
                                  persistQc: Boolean,
                                  broadcastQueries: Boolean): (DataFrame, Option[DataFrame]) = {
    // query-to-centroid distances (|q| x C, C capped): skinny rows; both
    // probe phases read them, so the in-session path persists (held by the
    // CacheManager until the caller clears it — see ivfTopK's lifecycle
    // note) while the indexed path recomputes the narrow frame to stay
    // cache-free
    val cents = centsDf.withColumn("n_c", vec_norm2(col("cv")))
    val q = quantize(queries, "query_id", "qv").withColumn("n_q", vec_norm2(col("qv")))
    val qc0 = q.crossJoin(broadcast(cents))
      .withColumn("dqc2", col("n_q") - lit(2.0) * vec_dot(col("qv"), col("cv")) + col("n_c"))
      .select(col("query_id"), col("cent_id"),
        sqrt(greatest(col("dqc2"), lit(0.0))).as("dqc"))
    val qc = if (persistQc) qc0.persist(StorageLevel.MEMORY_AND_DISK) else qc0

    val pWin = Window.partitionBy("query_id").orderBy(col("dqc"), col("cent_id"))
    val rWin = Window.partitionBy("query_id").orderBy(col("dist2"), col("vec_id"))
    def rankMembers(probes: DataFrame): DataFrame = {
      // default: probe rows meet the corpus on cell, then the small query
      // frame is broadcast in. Large-batch: attach qv/n_q to the skinny
      // probe rows FIRST (shuffle join on query_id), so the cell equijoin
      // carries them and no query-sized broadcast exists.
      // the shuffle_hash hints ENFORCE the no-query-broadcast contract:
      // without them the planner would happily auto-broadcast q (or the
      // query-carrying probe frame) whenever its size ESTIMATE (often
      // wildly low behind a selective-looking filter) falls under the
      // threshold — exactly the failure the caller opted out of. BOTH
      // query-carrying joins are hinted: the q attach AND the cell
      // equijoin's probe side (the r5 advice gap — only the first join was
      // pinned, so the planner could still broadcast the query-carrying
      // frame into `assigned`).
      val withQ =
        if (broadcastQueries)
          probes.join(assigned, probes("cent_id") === assigned("cell"))
            .join(broadcast(q), "query_id")
        else
          probes.join(q.hint("shuffle_hash"), "query_id")
            .hint("shuffle_hash")
            .join(assigned, probes("cent_id") === assigned("cell"))
      withQ
        .where(col("query_id") =!= col("vec_id"))
        .withColumn("dist2",
          col("n_q") - lit(2.0) * vec_dot(col("qv"), col("v")) + col("n_v"))
        .withColumn("rnk", row_number().over(rWin))
        .where(col("rnk") <= k)
    }

    // phase 1: nProbe nearest cells -> d_k upper bound (null if < k found,
    // which falls back to probing every cell — still exact, never wrong)
    val probes1 = qc.withColumn("prn", row_number().over(pWin))
      .where(col("prn") <= nProbe).select("query_id", "cent_id")
    val dk = rankMembers(probes1).groupBy("query_id")
      .agg(count(lit(1)).as("found"), max(sqrt(col("dist2"))).as("dk0"))
      .select(col("query_id"), when(col("found") === k, col("dk0")).as("dk"))

    // phase 2: all cells whose lower bound beats d_k (includes every
    // phase-1 cell that contributed a top-k member, by the same inequality).
    // dk is query-sized too, so the large-batch mode keeps it out of
    // broadcasts as well; the capped `cells` frame may broadcast freely in
    // either mode (corpus-bounded, <= maxCentroids rows).
    val probes2 = qc.join(cells, qc("cent_id") === cells("cell"))
      .join(if (broadcastQueries) dk else dk.hint("shuffle_hash"),
        Seq("query_id"), "left")
      .where(col("dk").isNull || (col("dqc") - col("rc") <= col("dk") + lit(1e-6)))
      .select("query_id", "cent_id")
    (rankMembers(probes2).select("query_id", "vec_id", "rnk", "dist2"),
      if (persistQc) Some(qc) else None)
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
    * B defaults to ~sqrt(4 * parallelism) so the B(B+1)/2 reducers track
    * cluster size without caller tuning (work per reducer is (n/B)^2 dots);
    * the output row SET is identical at every B. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double, blocks: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val b = Dedup.ThetaBlocks.resolve(spark, blocks)
    // persisted: the quantize+norm pass feeds BOTH sides of the block-pair
    // self-join and was planned twice (r6, same CacheManager lifecycle
    // contract as the Dedup signature frames)
    val c = quantize(corpus, "vec_id", "v")
      .withColumn("n2", vec_norm2(col("v")))
      .withColumn("blk", pmod(hash(col("vec_id")), lit(b)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val blockPairs = (for { i <- 0 until b; j <- i until b } yield (i, j))
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
