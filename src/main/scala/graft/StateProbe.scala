package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._

/** One-off evidence probe (not part of the driver contract): runs the
  * three stateful streaming surfaces at SPARK_GRAFT_SF_DIR under the
  * RocksDB state store and prints the final progress's state-operator
  * metrics (rows, state bytes, rocksdb custom metrics) — the numbers
  * recorded in BASELINE.md's streaming state-store table. */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.StateStores.useRocksDb(spark)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    def report(label: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      if (!q.awaitTermination(600000))
        throw new IllegalStateException(s"$label did not terminate")
      val sos = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      val maxRows = if (sos.isEmpty) 0L else sos.map(_.numRowsTotal).max
      val last = q.lastProgress
      val lastSos = Option(last).toSeq.flatMap(_.stateOperators.toSeq)
      lastSos.foreach { so =>
        val cm = so.customMetrics.asScala
        println(f"STATE $label op=${so.operatorName} rowsFinal=${so.numRowsTotal} " +
          f"rowsMax=$maxRows memUsedBytes=${so.memoryUsedBytes} " +
          f"sstSize=${cm.getOrElse("rocksdbSstFileSize", "n/a")} " +
          f"pinnedMem=${cm.getOrElse("rocksdbPinnedBlocksMemoryUsage", "n/a")} " +
          f"commitLatencyMs=${so.allUpdatesTimeMs + so.commitTimeMs}")
      }
      if (lastSos.isEmpty) println(s"STATE $label no state operators")
    }

    def stream() = {
      val dir = DataQueries.stageStreamInput(sfDir, "graft-stateprobe")
      spark.readStream.schema(schema).parquet(dir.toString)
    }

    report("q_stream_events", stream()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sp_ev").trigger(Trigger.AvailableNow()).start())

    report("q_stream_hourly", graft.streaming.IncrementalIngest
      .windowedEventCounts(stream())
      .writeStream.outputMode("append").format("memory")
      .queryName("sp_hr").trigger(Trigger.AvailableNow()).start())

    report("q_stream_sessions", graft.streaming.Sessionize.sessions(stream())
      .writeStream.outputMode("append").format("memory")
      .queryName("sp_se").trigger(Trigger.AvailableNow()).start())

    spark.stop()
  }
}
