package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Extra benchmark / profiling surface (NOT part of the driver
  * contract — Bench.scala stays the frozen measurement harness).
  *
  * For each query named in the args (or all of SparkEntry.queries when
  * none are given), runs the query's action (count, like Bench) with a
  * SparkListener attached and prints a per-JOB breakdown: wall time,
  * stage count, task count, shuffle bytes. Two reps per query (rep 2 =
  * warm numbers, the one to read). Use:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra dedup_minhash dedup_embedding"
  */
object BenchExtra {

  final case class JobRow(jobId: Int, desc: String, ms: Long, stages: Int,
                          tasks: Int, shufRead: Long, shufWrite: Long,
                          names: String)

  final class Collector extends SparkListener {
    val rows = mutable.ArrayBuffer.empty[JobRow]
    private val jobStart = mutable.Map.empty[Int, (Long, String, Int)]
    private val jobOfStage = mutable.Map.empty[Int, Int]
    private val stageAgg = mutable.Map.empty[Int, (Int, Long, Long)]
    private val stageNames = mutable.Map.empty[Int, List[String]]
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobStart(js.jobId) = (js.time, desc, js.stageIds.length)
      js.stageIds.foreach(sid => jobOfStage(sid) = js.jobId)
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val jid = jobOfStage.getOrElse(si.stageId, -1)
        val (t, r, w) = stageAgg.getOrElse(jid, (0, 0L, 0L))
        stageAgg(jid) = (t + si.numTasks,
          r + m.shuffleReadMetrics.totalBytesRead,
          w + m.shuffleWriteMetrics.bytesWritten)
        stageNames(jid) = si.name :: stageNames.getOrElse(jid, Nil)
      }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      jobStart.remove(je.jobId).foreach { case (t0, desc, nStages) =>
        val (tasks, r, w) = stageAgg.getOrElse(je.jobId, (0, 0L, 0L))
        rows += JobRow(je.jobId, desc, je.time - t0, nStages, tasks, r, w,
          stageNames.getOrElse(je.jobId, Nil).reverse.mkString(" | "))
      }
    }
    def reset(): Unit =
      synchronized { rows.clear(); stageAgg.clear(); stageNames.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val col = new Collector
    spark.sparkContext.addSparkListener(col)
    // same warmup as Bench
    try {
      spark.range(0, 1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100).count()
    } catch { case _: Throwable => () }
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name0 =>
      // "set:key=value" pseudo-entries flip session confs mid-run, so
      // an A/B comparison runs inside ONE JVM (same JIT/host window)
      if (name0.startsWith("set:")) {
        val Array(k, v) = name0.stripPrefix("set:").split("=", 2)
        spark.conf.set(k, v)
        println(s"==== conf $k=$v")
      } else {
      val name = name0
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { rep =>
        col.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // give listener events a moment to drain
        Thread.sleep(200)
        println(f"==== $name rep$rep total $dt%.2f s, ${col.rows.length} jobs")
        if (rep == 2 && !sys.env.contains("SPARK_GRAFT_EXTRA_QUIET"))
          col.rows.foreach { r =>
            println(f"  job ${r.jobId}%4d ${r.ms}%6d ms stages=${r.stages}%2d " +
              f"tasks=${r.tasks}%4d shufR=${r.shufRead}%9d shufW=${r.shufWrite}%9d" +
              f" ${r.names.take(140)}")
          }
      }
      }
    }
    spark.stop()
  }
}
