package graft

import graft.datapipe.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling entry (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().appName("probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    time("warmup")(docs.count())
    time("simhash_full")(Dedup.simhashNearDup(docs).count())
    spark.catalog.clearCache()
    time("simhash_full2")(Dedup.simhashNearDup(docs).count())
    spark.catalog.clearCache()
    spark.stop()
  }
}
