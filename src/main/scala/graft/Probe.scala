package graft

import graft.operators.{DepPathsStage, Preprocess}
import graft.sources.Gen
import org.apache.spark.sql.SparkSession

/** Throwaway profiling entry (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("probe").getOrCreate()
    val cpus = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def mine(n: Long) =
      DepPathsStage.instances(Preprocess.annotate(
        spark.range(0, n, 1, cpus * 4).as[Long].map(Gen.doc _)))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    time("warmup")(mine(5000).count())
    Seq(300000L, 600000L, 1000000L).foreach { n =>
      time(s"count n=$n")(mine(n).count())
    }
    Seq(300000L, 1000000L).foreach { n =>
      val p = mine(n).persist()
      time(s"persist n=$n")(p.count())
      p.unpersist(blocking = true)
    }
    spark.stop()
  }
}
