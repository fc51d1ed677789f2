package graft

import graft.streaming.{SessEvent, SessState, Sessionize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gapMs = 30 * 60000L

  private def e(m: Long) = SessEvent(1, new java.sql.Timestamp(m * 60000L))
  private def s(a: Long, b: Long, n: Long) =
    SessState(a * 60000L, b * 60000L, n)

  test("fold: contiguous events extend; a gap splits the pending set") {
    assert(Sessionize.fold(Nil,
      Seq(e(0), e(10), e(20), e(120), e(125)), gapMs) ===
      Seq(s(0, 20, 3), s(120, 125, 2)))
  }

  test("fold: resumes pending sessions from prior state") {
    assert(Sessionize.fold(Seq(s(0, 10, 2)), Seq(e(20)), gapMs) ===
      Seq(s(0, 20, 3)))
  }

  test("fold: an admissible late event merges a gap-split pair back into " +
      "one session (the premature-emission scenario)") {
    // batch 1: 10:00 and 10:35 split into two pending sessions
    val afterB1 = Sessionize.fold(Nil, Seq(e(600), e(635)), gapMs)
    assert(afterB1 === Seq(s(600, 600, 1), s(635, 635, 1)))
    // batch 2: 10:28 (>= the 10:25 watermark, so Spark delivers it) is
    // within the gap of BOTH — the true session is one [10:00, 10:35]
    // n=3. Under the old emit-on-gap rule the first session had already
    // been emitted as [10:00, 10:00] n=1 — unfixably wrong in append
    // mode; holding sessions until the watermark finalizes them is why
    // fold merges instead of dropping or double-emitting.
    assert(Sessionize.fold(afterB1, Seq(e(628)), gapMs) ===
      Seq(s(600, 635, 3)))
  }

  test("fold: arrival order across batches cannot change the final set") {
    val events = Seq(e(0), e(10), e(45), e(50), e(95), e(200))
    val expected = Sessionize.fold(Nil, events, gapMs)
    // every permutation, split arbitrarily into two batches
    events.permutations.take(120).foreach { p =>
      (0 to p.length).foreach { cut =>
        val (b1, b2) = p.splitAt(cut)
        val got = Sessionize.fold(Sessionize.fold(Nil, b1, gapMs), b2, gapMs)
        assert(got === expected, s"order $p cut $cut")
      }
    }
  }

  test("fold: equals the brute-force gap-split of all events, any batching") {
    // reference: sort ALL events, split where the gap exceeds gapMs —
    // the connected components the fold's sweep must reproduce
    def reference(ts: Seq[Long]): Seq[SessState] = {
      val sorted = ts.sorted
      if (sorted.isEmpty) Nil
      else sorted.tail.foldLeft(List(SessState(sorted.head, sorted.head, 1))) {
        case (acc @ h :: t, x) =>
          if (x <= h.end_ms + gapMs) SessState(h.start_ms, x, h.n + 1) :: t
          else SessState(x, x, 1) :: acc
        case (Nil, _) => Nil // unreachable
      }.reverse
    }
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      // minute-scale spread with duplicates and adversarial clumping
      val ts = Seq.fill(n)(rnd.nextInt(2000).toLong * 60000L)
      val events = rnd.shuffle(ts).map(m => SessEvent(1, new java.sql.Timestamp(m)))
      // fold across 1-4 random batch cuts
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(n + 1)).sorted
      val batches = (0L +: cuts.map(_.toLong) :+ n.toLong).distinct
        .sliding(2).map { case Seq(a, b) =>
          events.slice(a.toInt, b.toInt) }.toSeq
      val got = batches.foldLeft(Seq.empty[SessState])(
        (st, b) => Sessionize.fold(st, b, gapMs))
      assert(got === reference(ts), s"trial $trial ts=$ts cuts=$cuts")
    }
  }

  test("streaming: a late admissible event merges across micro-batches " +
      "and the watermark finalizes exactly the settled sessions") {
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-sess-late")
    def writeBatch(name: String, mtime: Long, rows: Seq[(Long, Long)]): Unit = {
      val stage = Files.createTempDirectory(s"graft-sess-late-$name")
      rows.map { case (u, m) => (u, new java.sql.Timestamp(m * 60000L)) }
        .toDF("user_id", "ts").coalesce(1).write
        .mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      val dest = dir.resolve(s"$name.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(mtime)): Unit
    }
    // mtimes force the micro-batch order (file source sorts by mtime)
    writeBatch("b1", 1000000L, Seq((1L, 600L), (1L, 635L)))
    writeBatch("b2", 2000000L, Seq((1L, 628L))) // late but >= wm (10:25)
    writeBatch("b3", 3000000L, Seq((1L, 720L))) // advances wm to 11:50
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Sessionize.sessions(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val out = spark.table("sess_late")
      .as[graft.streaming.SessionOut].collect().toSeq
    // ONE finalized session [10:00, 10:35] n=3 — the 10:28 event merged
    // the gap-split pair; [12:00] stays pending (watermark 11:50 has
    // not passed its end + gap)
    assert(out === Seq(graft.streaming.SessionOut(
      1L, 600L * 60000L, 635L * 60000L, 3L)))
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

  test("streaming sessions at a 1e5-user keyspace on the RocksDB state " +
      "store: state rows stay <= keys and drain to zero") {
    val nUsers = 100000L
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-big")
    // batch 1: two events per user inside one session (minutes 0 and 5)
    // — pending state holds exactly one session per user after it.
    // batch 2 (later mtime): one far-future sentinel event that drives
    // the watermark past every user's end + gap, finalizing all 1e5
    // sessions and draining their state.
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    def writeBatch(name: String, mtime: Long, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = Files.createTempDirectory(s"graft-sess-big-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      val dest = dir.resolve(s"$name.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(mtime)): Unit
    }
    writeBatch("b1", 1000000L,
      spark.range(0, nUsers).select(col("id").as("user_id"))
        .select(col("user_id"), explode(array(lit(0L), lit(5L))).as("m"))
        .select(col("user_id"),
          timestamp_millis(col("m") * 60000L).as("ts")))
    writeBatch("b2", 2000000L,
      spark.range(0, 1).select(lit(0L).as("user_id"),
        timestamp_millis(lit(600L * 60000L)).as("ts")))
    graft.streaming.StateStores.useRocksDb(spark)
    try {
      val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      val q = Sessionize.sessions(stream, gapMinutes = 30)
        .writeStream.outputMode("append").format("memory")
        .queryName("sess_big").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(600000)
      // every user's [0,5] session finalized; the sentinel stays pending
      assert(spark.table("sess_big").count() === nUsers)
      val stateRows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
      // fMGWS keeps ONE state row per key: never more rows than users
      // (+1 sentinel), and the final batch drains all but the sentinel
      assert(stateRows.nonEmpty && stateRows.max <= nUsers + 1)
      assert(stateRows.last === 1L)
      // the run really went through RocksDB, not the default provider
      val custom = q.recentProgress.toSeq.flatMap(
        _.stateOperators.toSeq.flatMap(_.customMetrics.asScala.keys))
      assert(custom.exists(_.startsWith("rocksdb")),
        s"no rocksdb metrics in $custom")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
