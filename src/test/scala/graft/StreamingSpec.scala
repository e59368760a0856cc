package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming coverage: watermarked tumbling-window aggregation and
  * custom per-key state via mapGroupsWithState over the events schema
  * (event_id, ts, user_id, event_type, value). The same windowed aggregation
  * runs in batch as q03_events_window — this pins the streaming execution
  * path. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling-window count over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("ws"), $"event_type", $"cnt")

    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(5), "click", 2.0), (ts(7), "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close the first window
      input.addData((ts(40), "click", 4.0))
      q.processAllAvailable()
      input.addData((ts(59), "click", 5.0))
      q.processAllAvailable()
      val out = spark.table("win_counts").as[(Timestamp, String, Long)].collect().toSet
      assert(out.contains((ts(0), "click", 2L)))
      assert(out.contains((ts(0), "view", 1L)))
    } finally q.stop()
  }

  test("streaming spatial pipeline: stream-static cell equijoin + tile agg") {
    // the flagship's operators composed under Structured Streaming: a point
    // stream joins the STATIC polygon cover on cell id (stream-static inner
    // join — no state needed), ray-cast refines, tiles aggregate per
    // watermark window. Results must equal the batch join on the same rows.
    import graft.functions.GraftFunctions._
    implicit val sqlCtx = spark.sqlContext
    val polys = Seq((1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        (2L, "POLYGON ((-20 -20, -5 -20, -5 -5, -20 -5, -20 -20))"))
      .toDF("poly_id", "wkt")
      .withColumn("geom", st_geomfromtext(col("wkt")))
      .select(col("poly_id"), explode(st_cover(col("geom"), 10)).as("cv"),
        st_rings(col("geom")).as("rings"))
      .select(col("poly_id"), col("cv.cell").as("cell"), col("cv.full").as("full"), col("rings"))

    val input = MemoryStream[(Long, Double, Double, Timestamp)]
    val joined = input.toDF().toDF("point_id", "lon", "lat", "ts")
      .withWatermark("ts", "10 minutes")
      .withColumn("cell", explode(st_cell_ancestors(col("lon"), col("lat"), 10)))
      .join(polys, "cell")
      .where(col("full") || st_contains_rings(col("rings"), col("lon"), col("lat")))
      .groupBy(window(col("ts"), "15 minutes"), col("poly_id"))
      .agg(count(lit(1)).as("pts"))
      .select(col("window.start").as("ws"), col("poly_id"), col("pts"))

    val q = joined.writeStream.format("memory").queryName("stream_join")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((10L, 5.0, 5.0, ts(1)), (11L, 5.5, 9.5, ts(2)),
        (12L, -10.0, -10.0, ts(3)), (13L, 50.0, 50.0, ts(4))) // 13: no match
      q.processAllAvailable()
      input.addData((14L, 5.0, 5.0, ts(50))) // advance watermark, close window
      q.processAllAvailable()
      val out = spark.table("stream_join").as[(Timestamp, Long, Long)].collect().toSet
      assert(out.contains((ts(0), 1L, 2L)), s"poly 1 should hold points 10+11: $out")
      assert(out.contains((ts(0), 2L, 1L)), s"poly 2 should hold point 12: $out")
      assert(!out.exists(r => r._2 != 1L && r._2 != 2L))
    } finally q.stop()
  }

  test("streaming dedup: exact key dedup + n-gram-signature near-dup suppression") {
    // the dedup pillar under Structured Streaming: a document stream is
    // deduplicated (a) exactly on a content key and (b) fuzzily on the
    // ngram_hash_set fingerprint of the text — dropDuplicatesWithinWatermark
    // keeps per-key state only inside the watermark horizon, the streaming
    // analog of the batch exactKeep/ngramJaccardPairs pipeline stages
    import graft.functions.GraftFunctions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = input.toDF().toDF("doc_id", "text", "ts")
      .withWatermark("ts", "10 minutes")
      // n-gram signature as the fuzzy key: identical texts (and texts whose
      // 8-gram sets coincide) collapse to one surviving row
      .withColumn("sig", xxhash64(ngram_hash_set(col("text"), 8)))
      .dropDuplicatesWithinWatermark("sig")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps", ts(1)),
        (2L, "the quick brown fox jumps", ts(2)), // exact dup of 1
        (3L, "a completely different document", ts(3)))
      q.processAllAvailable()
      input.addData((4L, "the quick brown fox jumps", ts(5))) // dup again
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L) && ids.contains(3L), s"first occurrences survive: $ids")
      assert(!ids.contains(2L) && !ids.contains(4L), s"in-horizon dups dropped: $ids")
    } finally q.stop()
  }

  test("streaming curation: stratified sampling + PII redaction on a document stream") {
    // the round-5 curation ops are STATELESS narrow transforms, so they run
    // unchanged under Structured Streaming (no watermark, no state store) —
    // and, because selection is the portable hash test rather than RNG, the
    // streamed kept-set equals the batch kept-set on the same rows
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val redacted = graft.operators.Sampling.stratified(
        input.toDF().toDF("doc_id", "lang", "text"),
        "doc_id", "lang", Map("en" -> 0.5), defaultRate = 1.0)
      .select(col("doc_id"), col("lang"),
        graft.functions.Pii.redactPii(col("text")).as("clean"))
    val q = redacted.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = (0 until 200).map(i =>
        (i.toLong, if (i % 2 == 0) "en" else "fr", s"doc $i mail u$i@ex.com end"))
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("curated").as[(Long, String, String)].collect()
      // batch reference on the same rows
      val want = graft.operators.Sampling.stratified(
          rows.toDF("doc_id", "lang", "text"),
          "doc_id", "lang", Map("en" -> 0.5), defaultRate = 1.0)
        .select(col("doc_id"), col("lang"),
          graft.functions.Pii.redactPii(col("text")).as("clean"))
        .as[(Long, String, String)].collect()
      assert(got.sorted.toSeq == want.sorted.toSeq, "stream == batch on identical rows")
      assert(got.forall(_._3.contains("[EMAIL]")), "every kept doc is redacted")
      val kept = got.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
      assert(kept("fr") == 100, "default rate 1.0 keeps all fr docs")
      assert(kept.getOrElse("en", 0) < 100, "en sampled below 1.0")
    } finally q.stop()
  }

  test("mapGroupsWithState: running per-user event counter") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
    val q = counted.toDF("user_id", "n").writeStream.format("memory")
      .queryName("user_counts").outputMode(OutputMode.Update).start()
    try {
      input.addData((1L, 1.0), (1L, 2.0), (2L, 3.0))
      q.processAllAvailable()
      input.addData((1L, 4.0))
      q.processAllAvailable()
      val last = spark.table("user_counts").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).max }
      assert(last(1L) == 3L && last(2L) == 1L)
    } finally q.stop()
  }
}
