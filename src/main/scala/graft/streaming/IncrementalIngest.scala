package graft.streaming

import graft.core.{IceDoc, Triple}
import graft.operators.{DepPathsStage, Preprocess, RelationRule, TaggerStage}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming corpus ingest (SURVEY.md §2.9).
  *
  * The reference is strictly batch; its incremental mechanisms are the
  * preprocess-once annotation cache and the per-doc DepPathsLog path
  * cache (DepPaths.java:585-676). The Spark-native equivalent is a file
  * stream over the corpus directory: newly appended document files flow
  * through the same deterministic per-doc stages (preprocess → path
  * mining → rule tagging are all narrow, so they run unchanged inside a
  * micro-batch), and each micro-batch appends its triples to the output
  * table exactly once (checkpointed offsets = resumability).
  *
  * `Trigger.AvailableNow` drains everything currently in the directory
  * and stops — the batch-equivalent run; a continuous deployment would
  * use the default trigger unchanged.
  */
object IncrementalIngest {

  /** Stream documents (parquet files with the interleaved-span schema
    * appearing under `inputDir`) into an append-only triples table at
    * `outDir`, tagging with the given broadcast rule set. */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          checkpointDir: String, rules: Seq[RelationRule]): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[IceDoc].schema
    val docs = spark.readStream.schema(schema).parquet(inputDir).as[IceDoc]
    val triples = tagBatch(docs, rules)
    triples.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The per-micro-batch transformation — identical code to the batch
    * pipeline (narrow stages only, so it is valid under streaming
    * semantics with no watermark needed). */
  def tagBatch(docs: Dataset[IceDoc], rules: Seq[RelationRule]): Dataset[Triple] =
    TaggerStage.triples(DepPathsStage.instances(Preprocess.annotate(docs)), rules)

  /** Stream a corpus increment (parquet `IceDoc` files appearing under
    * `inputDir`) through the NLP preprocess into an append-only
    * annotations table — the streaming form of the annotation-cache
    * checkpoint (stage-1 table of the batch pipeline). Preprocess is
    * narrow (per-doc mapPartitions), so it runs unchanged inside a
    * micro-batch; checkpointed source offsets make the append
    * exactly-once across restarts. The drained table then enters
    * [[graft.operators.IncrementalPaths.mergeInstances]] where the
    * newly-ingested doc ids are dirty by definition (no cached rows) —
    * the reference's DepPathsLog cache semantics (DepPaths.java:585-676)
    * as a streaming pipeline (gate `kg_stream_incremental`). */
  def annotateStream(spark: SparkSession, inputDir: String, outDir: String,
                     checkpointDir: String): StreamingQuery = {
    val schema = org.apache.spark.sql.Encoders.product[IceDoc].schema
    val docs = spark.readStream.schema(schema).parquet(inputDir).as[IceDoc](
      org.apache.spark.sql.Encoders.product[IceDoc])
    Preprocess.annotate(docs).toDF().writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming windowed event aggregation (watermarked) — the standard
    * late-data-tolerant rollup shape for the events table. */
  def windowedEventCounts(events: DataFrame,
                          windowLen: String = "1 hour",
                          watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      // a null event-time row would form a null-window group whose state
      // is never watermark-evicted in append mode — output stays
      // oracle-consistent (both sides suppress it) but the state leaks
      // unboundedly on a continuous stream; mirror Sessionize's guard
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }
}
