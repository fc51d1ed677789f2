package graft

import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Child-JVM main for ResumeSpec's hard-kill test: runs the full
  * pipeline while a watcher thread calls `Runtime.halt` — no shutdown
  * hooks, no finally blocks, so from the filesystem's point of view it
  * is a kill -9 — the moment the watched stage's manifest lands. The
  * parent test then resumes over the same root and asserts that
  * committed snapshots survive untouched and the final tables match an
  * uninterrupted run. */
object CrashRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, root, watchStage) = args
    val manifest = java.nio.file.Paths.get(root, watchStage, "_manifest.json")
    val watcher = new Thread(() => {
      while (!java.nio.file.Files.exists(manifest)) Thread.sleep(10)
      Runtime.getRuntime.halt(137)
    }, "crash-watcher")
    watcher.setDaemon(true)
    watcher.start()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-crash-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    KgPipeline.runAll(spark, sfDir, root)
    // Reaching here means the pipeline outran the halt — exit with a
    // distinct code so the parent's 137 assertion fails loudly.
    spark.stop()
    sys.exit(3)
  }
}
