package graft

import graft.streaming.{SessEvent, SessState, Sessionize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gapMs = 30 * 60000L

  test("fold: contiguous events extend; a gap closes and reopens") {
    def e(m: Long) = SessEvent(1, new java.sql.Timestamp(m * 60000L))
    val (open, closed) = Sessionize.fold(None,
      Seq(e(0), e(10), e(20), e(120), e(125)), gapMs)
    assert(closed.map(c => (c.start_ms, c.end_ms, c.n_events)) ===
      Seq((0L, 20 * 60000L, 3L)))
    assert(open === Some(SessState(120 * 60000L, 125 * 60000L, 2L)))
  }

  test("fold: resumes an open session from prior state") {
    val prior = Some(SessState(0L, 10 * 60000L, 2L))
    val (open, closed) = Sessionize.fold(prior,
      Seq(SessEvent(1, new java.sql.Timestamp(20 * 60000L))), gapMs)
    assert(closed.isEmpty)
    assert(open === Some(SessState(0L, 20 * 60000L, 3L)))
  }

  test("streaming sessions: closed sessions are plausible and consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess")
    // 3 files so AvailableNow + maxFilesPerTrigger=1 yields multiple
    // micro-batches (watermark advances between them, firing timeouts)
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .orderBy("ts").limit(600)
    src.withColumn("b", ntile(3).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts")))
      .repartition(3, col("b")).drop("b")
      .write.mode("overwrite").parquet(dir.toString)
    val schema = src.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Sessionize.sessions(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = spark.table("sess_out")
      .as[graft.streaming.SessionOut].collect()
    assert(out.nonEmpty, "no sessions closed")
    out.foreach { s =>
      assert(s.n_events >= 1)
      assert(s.end_ms >= s.start_ms)
    }
    // closed-session event mass can't exceed the input
    assert(out.map(_.n_events).sum <= 600)
  }
}
