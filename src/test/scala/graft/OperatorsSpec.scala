package graft

import graft.core.{RayCast, WktParser}
import graft.functions.GraftFunctions._
import graft.operators.{Ann, Dedup, Knn, SpatialJoin}
import org.apache.spark.sql.functions._

/** Operator-level correctness: spatial join vs an O(n*m) brute-force oracle
  * on NON-rectangular polygons with holes, salted == plain, kNN vs brute
  * force, LSH ANN recall. */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  private val polyWkts = Seq(
    (1L, "POLYGON ((10 10, 40 12, 42 38, 12 40, 10 10), (20 20, 30 20, 30 30, 20 30, 20 20))"),
    (2L, "MULTIPOLYGON (((-60 -20, -40 -25, -35 -5, -55 0, -60 -20)), ((70 50, 85 52, 83 64, 71 60, 70 50)))"),
    (3L, "POLYGON ((-10 -10, 15 -12, 18 14, -8 12, -10 -10))"), // overlaps poly 1 region
    (4L, "POLYGON ((100 -80, 170 -80, 170 -10, 100 -10, 100 -80))")) // large -> coarse cells

  private def randomPoints(n: Int) = {
    val rnd = new scala.util.Random(77)
    (0 until n).map(i => (i.toLong,
      rnd.nextDouble() * 340 - 170, rnd.nextDouble() * 160 - 80))
  }

  test("spatial join == brute-force ray-cast oracle (holes, multipolygons)") {
    val pts = randomPoints(4000)
    val ptsDf = pts.toDF("point_id", "lon", "lat")
    val polysDf = polyWkts.toDF("poly_id", "wkt")
      .withColumn("geom", st_geomfromtext($"wkt")).select("poly_id", "geom")

    val got = SpatialJoin.pointsInPolygons(ptsDf, polysDf, level = 9)
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet

    val geoms = polyWkts.map { case (id, w) => (id, WktParser.parse(w)) }
    val want = (for {
      (pid, lon, lat) <- pts
      (gid, g) <- geoms
      if RayCast.contains(g, lon, lat)
    } yield (pid, gid)).toSet
    assert(got == want, s"diff: got-want=${(got -- want).take(5)} want-got=${(want -- got).take(5)}")
    assert(want.nonEmpty)
  }

  test("salted spatial join result identical to plain") {
    val pts = randomPoints(3000).toDF("point_id", "lon", "lat")
    val polysDf = polyWkts.toDF("poly_id", "wkt")
      .withColumn("geom", st_geomfromtext($"wkt")).select("poly_id", "geom")
    val plain = SpatialJoin.pointsInPolygons(pts, polysDf, level = 9)
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
    val salted = SpatialJoin.pointsInPolygonsSalted(pts, polysDf, level = 9,
      salt = 4, sampleFraction = 0.2, hotThreshold = 50L)
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
    assert(plain == salted)
  }

  test("expanding k-ring kNN == brute force") {
    val pts = randomPoints(3000).toDF("point_id", "lon", "lat")
    val qs = (0 until 20).map(i => (i.toLong, (i * 37 % 340) - 170.0 + 0.3, (i * 53 % 160) - 80.0 + 0.7))
      .toDF("query_id", "qlon", "qlat")
    val fast = Knn.knn(qs, pts, k = 7, level = 6)
      .as[(Long, Long, Int)].collect().toSet
    val brute = Knn.knnBrute(qs, pts, k = 7)
      .as[(Long, Long, Int)].collect().toSet
    assert(fast == brute)
    assert(brute.size == 20 * 7)
  }

  test("kNN with reliable checkpointing matches the default path") {
    val dir = java.nio.file.Files.createTempDirectory("knn-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pts = randomPoints(500).toDF("point_id", "lon", "lat")
    val qs = randomPoints(520).drop(500).toDF("query_id", "qlon", "qlat")
    val a = Knn.knn(qs, pts, k = 4, level = 6)
      .select("query_id", "point_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val b = Knn.knn(qs, pts, k = 4, level = 6, reliableCheckpoint = true)
      .select("query_id", "point_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("kNN over the bucketed celled-corpus table matches the inline path") {
    // 100 TB shape: cell the corpus ONCE into a cell-co-located parquet
    // table; knnCelled reads it back with no re-cell / no re-persist and
    // must produce the identical result set
    val pts = randomPoints(2500).toDF("point_id", "lon", "lat")
    val qs = (0 until 15).map(i => (i.toLong, (i * 41 % 340) - 170.0 + 0.2, (i * 59 % 160) - 80.0 + 0.5))
      .toDF("query_id", "qlon", "qlat")
    val dir = java.nio.file.Files.createTempDirectory("knn-bucketed").toString
    Knn.writeCelledCorpus(pts, s"$dir/celled", level = 6)
    val bucketed = Knn.knnCelled(qs, spark.read.parquet(s"$dir/celled"), k = 7, level = 6)
      .select("query_id", "point_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val inline = Knn.knn(qs, pts, k = 7, level = 6)
      .select("query_id", "point_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(bucketed == inline && bucketed.nonEmpty)
  }

  test("kNN with k larger than point count falls back to brute force") {
    val pts = randomPoints(5).toDF("point_id", "lon", "lat")
    val qs = Seq((0L, 0.0, 0.0)).toDF("query_id", "qlon", "qlat")
    val out = Knn.knn(qs, pts, k = 9, level = 6).collect()
    assert(out.length == 5)
  }

  test("exact dedup keeps smallest id per key") {
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa")).toDF("id", "k")
    val kept = Dedup.exactKeep(df, "id", "k").as[(String, Long, Long)].collect()
      .map { case (k, keep, n) => k -> ((keep, n)) }.toMap
    assert(kept("aa") == ((1L, 3L)))
    val dropped = Dedup.dropExact(df, "id", "k").select("id").as[Long].collect().toSet
    assert(dropped == Set(1L, 2L))
  }

  test("minhash LSH finds planted near-duplicates") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"token$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, (100 to 160).map(i => s"other$i").mkString(" "))) ++
      (10 to 40).map(i => (i.toLong, (i to i + 50).map(j => s"w${j * 7 % 97}").mkString(" ")))
    val pairs = Dedup.minhashPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("jaccard pairs: dict (small-vocab) and prefix (large-vocab) paths == naive") {
    val rnd = new scala.util.Random(11)
    def naive(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
      val sets = docs.map { case (id, s) => id -> s.split(" ").toSet }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = (sa intersect sb).size.toDouble / (sa union sb).size
        if j >= t
      } yield (a, b)).toSet
    }
    def run(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] =
      Dedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // small vocabulary (12 tokens) -> dictionary/bitmask plan
    val vocabS = (1 to 12).map(i => s"t$i")
    val small = (0 until 80).map(i =>
      (i.toLong, rnd.shuffle(vocabS).take(6 + rnd.nextInt(5)).mkString(" ")))
    assert(run(small, 0.7) == naive(small, 0.7))

    // large vocabulary (300 tokens) -> prefix-filter plan
    val vocabL = (1 to 300).map(i => s"w$i")
    val big = (0 until 60).map { i =>
      val base = rnd.shuffle(vocabL).take(25)
      (i.toLong, (if (i % 3 == 0) base.updated(3, "swapped") else base).mkString(" "))
    }
    assert(run(big, 0.85) == naive(big, 0.85))
    // and directly exercise the prefix path on the small-vocab corpus too
    val toks = small.toDF("doc_id", "text")
      .select(col("doc_id").as("id"),
        // sorted: jaccardPairsPrefix's r6 contract (merge-kernel verify)
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("sz", size(col("toks")))
    val viaPrefix = Dedup.jaccardPairsPrefix(toks, 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaPrefix == naive(small, 0.7))
  }

  test("character-n-gram jaccard pairs == naive; order-sensitive vs word sets") {
    def grams(s: String, n: Int): Set[String] =
      if (s.length <= n) Set(s)
      else (0 to s.length - n).map(i => s.substring(i, i + n)).toSet
    def naive(docs: Seq[(Long, String)], n: Int, t: Double): Set[(Long, Long)] = {
      val sets = docs.map { case (id, s) => id -> grams(s, n) }
      (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = (sa intersect sb).size.toDouble / (sa union sb).size
        if j >= t
      } yield (a, b)).toSet
    }
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "dog lazy the over jumps fox brown quick the"), // SAME word set as 1
      (4L, "completely unrelated content right here"),
      (5L, ""), (6L, ""), // empty texts pair as exact duplicates
      (7L, "short")) // shorter than n: whole text is the single gram
    val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 12, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == naive(docs, 12, 0.5))
    assert(got.contains((1L, 2L)), "near-identical texts share most 12-grams")
    assert(!got.contains((1L, 3L)),
      "word-salad doc shares the WORD set of doc 1 but almost no 12-grams")
    assert(Dedup.jaccardPairs(docs.take(3).toDF("doc_id", "text"), "doc_id", "text", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet.contains((1L, 3L)),
      "sanity: the word-set variant DOES pair the word salad")
    assert(got.contains((5L, 6L)), "empty texts are exact duplicates of each other")
  }

  test("candidate-explosion breaker: bounded candidates, same pairs on a template corpus") {
    // pathological for prefix filtering: every doc is the same template with
    // one word swapped, so mid-frequency grams put every doc in every other
    // doc's candidate list, but true gram Jaccard stays BELOW threshold for
    // non-planted pairs. Planted exact duplicates are the only true pairs.
    // every doc is a PERMUTATION of the same 30 two-word phrases (words =
    // distinct random letters, so no shared prefixes across junctions):
    // phrase-interior grams appear in EVERY doc (flat df = n — the prefix
    // index can't avoid them and its fan-out estimate explodes), while two
    // permutations share almost no phrase ADJACENCIES, so boundary grams
    // differ and true gram Jaccard stays far below the 0.9 threshold
    def word(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 8).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val phrases = (1 to 30).map(k => s"${word(2 * k)} ${word(2 * k + 1)}")
    val docs = ((0 until 60).map { i =>
      (i.toLong, new scala.util.Random(i).shuffle(phrases).mkString(" "))
    } ++ Seq(100L, 101L, 102L).map(id => (id, phrases.mkString(" "))))
      .toDF("doc_id", "text")
    def run(guard: Long) = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 12, threshold = 0.9, maxCandidatePairs = guard)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = run(0L)
    assert(exact == Set((100L, 101L), (100L, 102L), (101L, 102L)))
    val grams = docs.select(col("doc_id").as("id"),
        ngram_hash_set(col("text"), 12).as("toks"))
      .withColumn("sz", size(col("toks")))
    // the prefix route's own fan-out estimate trips any reasonable bound...
    assert(Dedup.prefixFanout(Dedup.prefixIndex(grams, 0.9)) > 1000L)
    // ...while band-route candidate volume tracks TRUE similarity: the
    // planted dup trio (plus at most a stray sub-threshold collision)
    val bandCand = Dedup.bandCandidates(grams, 0.9).count()
    assert(bandCand <= 10, s"band candidates must stay bounded, got $bandCand")
    // armed breaker: same output, through the bounded candidate route
    assert(run(1000L) == exact)
    spark.catalog.clearCache() // prefixPlan persists its token subtree
  }

  test("ANN LSH top-k achieves high recall vs brute force") {
    // clustered embeddings (LSH's applicability regime): 20 centers + noise
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(20)(Array.fill(32)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.1f - 0.05f).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" % 80 === 0)
    val brute = Ann.bruteTopK(vecs, queries, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(vecs, queries, k = 10, nBits = 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("IVF top-k is EXACT (== brute force), including the <k fallback") {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.3f - 0.15f).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" % 30 === 0)
    val brute = Ann.bruteTopK(vecs, queries, k = 7)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val ivf = Ann.ivfTopK(vecs, queries, k = 7, maxCentroids = 12, nProbe = 2)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(ivf == brute, "triangle-inequality pruning must not lose a true neighbor")
    // degenerate regime: k near corpus size forces the d_k-null fallback
    val tiny = vecs.where($"vec_id" < 6)
    val b2 = Ann.bruteTopK(tiny, tiny, k = 5)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val i2 = Ann.ivfTopK(tiny, tiny, k = 5, maxCentroids = 3, nProbe = 1)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(i2 == b2)
    // skewed id distribution (odd ids only): the hash sample is still
    // well-defined and the result stays exact
    val odd = vecs.where($"vec_id" % 2 === 1)
    val i3 = Ann.ivfTopK(odd, odd.limit(3), k = 3, maxCentroids = 2, nProbe = 1)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val b3 = Ann.bruteTopK(odd, odd.limit(3), k = 3)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(i3 == b3 && i3.nonEmpty)
    // empty corpus: no crash, zero rows (brute fallback)
    assert(Ann.ivfTopK(vecs.where($"vec_id" < 0), vecs.limit(2), k = 3).count() == 0)
    // mixed-length vectors: brute's dist2 = n_q - 2*dot_minlen + n_v is the
    // zero-padding semantics, and the assignment kernel must match it (a
    // min-length-truncated distance would shrink cell radii and let phase 2
    // prune true neighbors)
    val mixed = (0 until 120).map { i =>
      val d = if (i % 3 == 0) 8 else 16
      (i.toLong, (0 until d).map(j => (((i * 7 + j * 13) % 19) - 9) / 10.0f).toSeq)
    }.toDF("vec_id", "embedding")
    val qm = mixed.where($"vec_id" % 20 === 0)
    val bm = Ann.bruteTopK(mixed, qm, k = 5)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val im = Ann.ivfTopK(mixed, qm, k = 5, maxCentroids = 10, nProbe = 2)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(im == bm && im.nonEmpty, "mixed-length corpora must stay exact")
    // the cap is corpus-size-independent: C(n) is monotone then flat
    assert(Ann.centroidCap(100) == 40 && Ann.centroidCap(1L << 40) == 4096 &&
      Ann.centroidCap(1) == 16)
  }

  test("IVF over a prebuilt on-disk index matches brute force") {
    // repeated-query-batch shape: build the index ONCE to parquet, then
    // answer batches against the files — identical output to ivfTopK/brute
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 240).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.2f - 0.1f).toSeq)
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    Ann.writeIvfIndex(vecs, s"$dir/idx", maxCentroids = 16)
    for (qmod <- Seq(40, 60)) { // two query batches over the SAME index
      val queries = vecs.where($"vec_id" % qmod === 0)
      val got = Ann.ivfTopKIndexed(queries, s"$dir/idx", k = 6, nProbe = 2)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
      val brute = Ann.bruteTopK(vecs, queries, k = 6)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
      assert(got == brute && got.nonEmpty, s"indexed IVF must be exact (qmod=$qmod)")
    }
    // empty corpus -> empty-but-readable index -> zero neighbors, no crash
    Ann.writeIvfIndex(vecs.where($"vec_id" < 0), s"$dir/empty")
    assert(Ann.ivfTopKIndexed(vecs.limit(2), s"$dir/empty", k = 3).count() == 0)

    // large-batch plan: query vectors routed through shuffle joins instead
    // of a query-frame broadcast — identical output by construction
    for (qmod <- Seq(40, 60)) {
      val queries = vecs.where($"vec_id" % qmod === 0)
      val shuffled = Ann.ivfTopKIndexed(queries, s"$dir/idx", k = 6, nProbe = 2,
          broadcastQueries = false)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
      val brute = Ann.bruteTopK(vecs, queries, k = 6)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
      assert(shuffled == brute && shuffled.nonEmpty, s"large-batch plan must be exact (qmod=$qmod)")
    }

    // huge-batch mode: cacheQueryDists pays the centroid kernel once and
    // must (a) return identical rows and (b) leave NOTHING in the session
    // CacheManager (the no-cache-to-manage service contract)
    spark.catalog.clearCache()
    val queries = vecs.where($"vec_id" % 40 === 0)
    val cached = Ann.ivfTopKIndexed(queries, s"$dir/idx", k = 6, nProbe = 2,
      cacheQueryDists = true)
    val want = Ann.ivfTopKIndexed(queries, s"$dir/idx", k = 6, nProbe = 2)
      .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(spark.sharedState.cacheManager.isEmpty,
      "cacheQueryDists must drop its cache before returning")
    val gotCached = cached.select("query_id", "vec_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(gotCached == want && gotCached.nonEmpty)
    graft.ParUtil.freeCheckpoint(cached)
  }

  test("blocked theta-joins: output invariant across block counts (incl. auto)") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(40)(Array.fill(16)(rnd.nextFloat() + 0.1f))
    val vecs = (0 until 80).map { i =>
      val v = if (i < 40) base(i) else base(i - 40).map(x => x * 1.001f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    def run(blocks: Int) = Ann.cosineDupPairs(vecs, 0.95, blocks)
      .as[(Long, Long)].collect().toSet
    val auto = run(0)
    assert(auto == run(3) && auto == run(16) && auto.nonEmpty,
      "pair set must not depend on the block count")
    // auto policy tracks parallelism: ~2x slots worth of uniform reducers
    val b = Dedup.ThetaBlocks.resolve(spark, 0)
    assert(b >= 4 &&
      b == math.ceil(math.sqrt(4.0 * spark.sparkContext.defaultParallelism)).toInt)
  }

  test("dedupGroups == naive union-find (random graph, chain, singletons)") {
    def naiveCC(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val rnd = new scala.util.Random(21)
    // random sparse graph + a long CHAIN (pointer jumping's worst case:
    // diameter >> 1, must converge in O(log d) rounds) + isolated nodes
    val n = 400
    val randomEdges = (0 until 150).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val chain = (200 until 339).map(i => (i.toLong, (i + 1).toLong)) // 140-node path
    val edges = randomEdges ++ chain
    val nodes = (0 until n).map(_.toLong).toDF("doc_id")
    val pairs = edges.toDF("id_a", "id_b")
    val got = Dedup.dedupGroups(nodes, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    val want = naiveCC(n, edges)
    assert(got == want, "component representative must be the exact component min")
    assert(got(339L) == 200L, "chain end must resolve to the chain head")
    assert(got(399L) == 399L, "isolated nodes keep themselves as representative")
    // pairs referencing ids NOT in nodes (stale pair file) are ignored: a
    // foreign id must never become a rep_id
    val dirty = Dedup.dedupGroups(Seq(5L, 6L).toDF("doc_id"),
        Seq((2L, 5L), (5L, 6L), (7L, 9L)).toDF("id_a", "id_b"), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(dirty == Map(5L -> 5L, 6L -> 5L),
      s"foreign-id pairs must be dropped, got $dirty")
    // EMPTY pair set (clean corpus): every node is its own representative.
    // Also pins the r6 observed-metric seed path on a zero-row aggregate —
    // a metrics-never-delivered regression would hang here, not just fail.
    val clean = Dedup.dedupGroups(Seq(1L, 2L, 3L).toDF("doc_id"),
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(clean == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("decontamination flags exactly the docs sharing a word 13-gram with the eval set") {
    // 13 words the contaminated corpus docs embed verbatim; clean docs
    // share VOCABULARY with the eval set but never 13 consecutive words
    val evalSeq = (1 to 13).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"intro text then $evalSeq and a tail"),      // embeds the gram mid-doc
      (2L, evalSeq),                                     // exactly the eval doc
      (3L, (1 to 13).map(i => s"w${14 - i}").mkString(" ")), // same words, reversed
      (4L, "completely unrelated content here"),
      (5L, (1 to 12).map(i => s"w$i").mkString(" ")),    // 12-word prefix only
      (6L, "")                                           // zero tokens: never flagged
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalSeq), (101L, "short eval probe")).toDF("eval_id", "text")
    val pairs = Dedup.contaminationPairs(corpus, "doc_id", "text",
      evalSet, "eval_id", "text", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 contains the full window (1 shared gram of its 8 windows);
    // doc 2 IS the window. Reversed/shorter/unrelated docs share nothing.
    assert(pairs == Set((1L, 100L, 1L), (2L, 100L, 1L)))
    // eval doc 101 is SHORTER than 13 tokens: its whole text is its one
    // gram, so only a doc containing that exact token sequence as a
    // whole-doc gram (or window) can match — none here
    val clean = Dedup.decontaminate(corpus, "doc_id", "text",
      evalSet, "eval_id", "text", n = 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L, 4L, 5L, 6L))
    // short-eval matching does work when the exact sequence appears: a
    // corpus doc equal to the short eval doc is flagged
    val c2 = Seq((7L, "short eval probe")).toDF("doc_id", "text")
    val p2 = Dedup.contaminationPairs(c2, "doc_id", "text",
      evalSet, "eval_id", "text", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == Set((7L, 101L)))
  }

  test("stratified sampling: deterministic, per-stratum rates, default fallback") {
    val df = (0 until 3000).map(i =>
      (i.toLong, Seq("A", "B", "C")(i % 3))).toDF("id", "stratum")
    def run() = graft.operators.Sampling.stratified(df, "id", "stratum",
        Map("A" -> 0.5, "B" -> 0.0), defaultRate = 1.0)
      .select("id").as[Long].collect().toSet
    val kept = run()
    val byStratum = kept.groupBy(id => Seq("A", "B", "C")((id % 3).toInt))
      .view.mapValues(_.size).toMap
    assert(byStratum.getOrElse("B", 0) == 0, "rate 0.0 keeps nothing")
    assert(byStratum("C") == 1000, "absent stratum falls back to defaultRate 1.0")
    val a = byStratum("A")
    assert(a > 350 && a < 650, s"rate 0.5 keeps about half, got $a of 1000")
    assert(run() == kept, "hash-based selection is deterministic")
    // invariance under repartitioning: the kept SET is a pure row property
    assert(graft.operators.Sampling.stratified(df.repartition(7), "id", "stratum",
      Map("A" -> 0.5, "B" -> 0.0), defaultRate = 1.0)
      .select("id").as[Long].collect().toSet == kept)
  }

  test("zero-token docs never acquire signatures (minhash + simhash)") {
    // includes tab/newline-only docs: Spark trim() strips only spaces, so a
    // trim-based guard would still pair (5, 6)
    val docs = Seq((1L, ""), (2L, "   "), (5L, "\t\t"), (6L, "\n \t"),
      (3L, "real text here with words"),
      (4L, "real text here with words")).toDF("doc_id", "text")
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh == Set((3L, 4L)), s"empty docs must not pair up, got $mh")
    val sh = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sh == Set((3L, 4L)))
    assert(graft.functions.textexprs.shingles("   ", 3).isEmpty)
    // direct SQL callers see null signatures for token-less docs, not the
    // degenerate all-MaxValue / all-zero values
    val sigs = docs.select(minhash(col("text"), 16, 3).as("mh"), simhash(col("text")).as("sh"))
      .collect()
    assert(sigs.count(r => r.isNullAt(0)) == 4 && sigs.count(r => r.isNullAt(1)) == 4)
  }

  test("jaccard: docs whose token sets filter to empty pair with nothing") {
    // minTokenLen filters 'a b' to the EMPTY set: the dict plan must not
    // report empty-set twins as J=1.0 while the prefix plan emits nothing
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "longword other words"),
      (4L, "longword other words")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.9, minTokenLen = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L)), s"empty-set docs must not pair: $pairs")
  }

  test("minhash bands beyond the signature length are clamped, not constant-key") {
    val docs = (0 until 30).map(i => (i.toLong,
      if (i % 2 == 0) s"alpha beta gamma delta epsilon zeta token$i"
      else s"totally different words here number $i unique")).toDF("doc_id", "text")
    val sane = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val clamped = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 16, bands = 64, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clamped == sane, "bands > numHashes must behave as bands == numHashes")
  }
}
