package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming coverage: the corpus-append incremental path
  * (SURVEY.md §2.9 — the reference is batch-only; Trigger.AvailableNow
  * file streaming is the Spark-native equivalent of its
  * preprocess-once cache). A windowed watermark aggregation over the
  * events table driven synchronously from parquet. */
class StreamingSpec extends SparkSpec {

  test("file-stream windowed aggregation with watermark (AvailableNow)") {
    val dir = "/root/testdata/sf0.001"
    // the file stream source requires a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("ev_windows")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits closed windows; completeness vs batch is
    // checked through the update-mode equivalent below
    val q2 = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_totals")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val streamed = spark.sql("SELECT event_type, n FROM ev_totals")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
