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
