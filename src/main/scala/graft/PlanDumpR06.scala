package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Round-6 plan snapshot tool (not part of the driver contract): writes
  * `plans/r06/<query>_<suffix>.txt` with the formatted physical plan of
  * each named query, so before/after plan diffs are committable
  * evidence. Usage:
  *   sbt "runMain graft.PlanDumpR06 before dedup_minhash kg_triples ..."
  */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDumpR06 <suffix> [query...]")
    val suffix = args.head
    val names = if (args.tail.nonEmpty) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("/root/repo/plans/r06")
    Files.createDirectories(dir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), p)
      spark.catalog.clearCache()
      println(s"wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
