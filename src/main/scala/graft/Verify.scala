package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (dev loop only).
    // Trimmed and validated like Bench's SPARK_GRAFT_ONLY: a misspelled
    // or space-padded name must fail loud — silently skipping it would
    // leave a STALE dump from a previous run in a reused outDir, and
    // the compare would read that as a fresh green
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      if (o.isEmpty || unknown.nonEmpty) {
        System.err.println(s"[verify] bad query filter: " +
          (if (o.isEmpty) "matched no queries"
           else s"unknown names ${unknown.toSeq.sorted.mkString(",")}"))
        sys.exit(1)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def deleteRecursively(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRecursively))
      f.delete(): Unit
    }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        // NonFatal only — a fatal JVM error must abort, not let later
        // queries dump plausible-but-corrupt parquet
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failures += name
          // a reused outDir must not present a PREVIOUS run's dump (or
          // this run's partial write) as this query's result — remove
          // it so the compare reports MISSING instead of a stale green
          deleteRecursively(new java.io.File(s"$outDir/$name"))
        }
        // release persisted blocks a query's pipeline may have cached
        // (long-lived sessions must not accumulate cache across queries)
        spark.catalog.clearCache()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = graft.core.JsonUtil.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // a failed query must fail the RUN, not just a stderr line the
    // caller may never read (the missing dump also fails the compare)
    if (failures.nonEmpty) {
      System.err.println(s"[verify] FAILED queries: ${failures.mkString(",")}")
      sys.exit(1)
    }
  }
}
