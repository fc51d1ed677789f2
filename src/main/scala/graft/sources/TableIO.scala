package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Iceberg-semantics stand-in (SURVEY.md §7 risk 1: no iceberg runtime
  * jar in this sandbox): partitioned Parquet + an atomically-committed
  * JSON manifest per table. A table is visible only after its manifest
  * lands (write-to-temp + atomic rename), so a killed run resumes from
  * the last committed snapshot; per-partition lineage rows and metrics
  * are written beside every commit (north rule).
  *
  * The trait boundary is deliberate: a real Iceberg catalog drops in by
  * reimplementing `commit`/`isCommitted`/`read` against the catalog API.
  */
final class TableIO(spark: SparkSession, root: String) {

  private def tableDir(name: String) = s"$root/$name"
  private def manifestPath(name: String): Path =
    Paths.get(tableDir(name), "_manifest.json")

  def isCommitted(name: String): Boolean = Files.exists(manifestPath(name))

  def read(name: String): DataFrame = {
    require(isCommitted(name), s"table $name has no committed snapshot")
    spark.read.parquet(s"${tableDir(name)}/data")
  }

  def manifest(name: String): String =
    Files.readString(manifestPath(name))

  /** Write + commit a stage output. Data lands under `<table>/data`;
    * the manifest (snapshot id, row count, wall time, input snapshots)
    * is renamed into place atomically as the commit point. Lineage rows
    * (one per output file ≈ per task partition) go to
    * `<table>/_lineage`. */
  /** `metrics` is by-name: it must be read only after the data write
    * below, so stage accumulator ticks from the executors are already
    * aggregated when the manifest captures them. */
  def commit(name: String, df: DataFrame, inputs: Seq[String] = Nil,
             partitionBy: Seq[String] = Nil,
             metrics: => Map[String, Long] = Map.empty): Unit = {
    val t0 = System.nanoTime()
    val dir = tableDir(name)
    val dataDir = s"$dir/data"
    // Re-committing an existing table must first UNCOMMIT it — the
    // manifest is the commit point, so it cannot keep pointing at data
    // that is being rewritten (a kill mid-rewrite would otherwise leave
    // a committed manifest over corrupt data, and resume would skip the
    // recompute). Then drop any uncommitted leftovers from a killed run.
    uncommit(name)
    deleteRecursively(Paths.get(dir))
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataDir)
    val wallMs = (System.nanoTime() - t0) / 1000000
    // per-partition lineage + total rows in ONE pass over the written
    // data. The lineage table (one row per data file) is written
    // DISTRIBUTED — at 100 TB a table has ~1M files, and collecting a
    // million rows per commit to the driver is avoidable pressure; the
    // manifest's row count comes from a sum over the (tiny) lineage
    // parquet instead.
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows_out"))
      .withColumn("stage", lit(name))
      .withColumn("wall_ms", lit(wallMs))
      .write.mode("overwrite").parquet(s"$dir/_lineage")
    val rows = spark.read.parquet(s"$dir/_lineage")
      .agg(coalesce(sum(col("rows_out")), lit(0L))).first().getLong(0)
    val snapshotId = java.util.UUID.randomUUID().toString
    val inputSnaps = inputs.map(i => s"${jstr(i)}: ${snapshotOf(i)}").mkString(",")
    val metricJson =
      metrics.toSeq.sorted.map { case (k, v) => s"${jstr(k)}:$v" }.mkString(",")
    val json =
      s"""{"table":${jstr(name)},"snapshot":"$snapshotId","rows":$rows,
         |"wall_ms":$wallMs,"metrics":{$metricJson},"inputs":{$inputSnaps}}""".stripMargin
    val tmp = Paths.get(dir, s"_manifest.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(name), StandardCopyOption.ATOMIC_MOVE)
  }

  private def snapshotOf(name: String): String =
    if (isCommitted(name)) {
      val m = manifest(name)
      val i = m.indexOf("\"snapshot\":\"") + 12
      "\"" + m.substring(i, m.indexOf('"', i)) + "\""
    } else "null"

  /** Run `compute` only if `name` has no committed snapshot; either way
    * return the committed table. This is the resume point: stages whose
    * snapshot is already committed are skipped entirely. */
  def getOrCompute(name: String, inputs: Seq[String] = Nil,
                   partitionBy: Seq[String] = Nil,
                   metrics: => Map[String, Long] = Map.empty)
                  (compute: => DataFrame): DataFrame = {
    // `metrics` is by-name: accumulator values are read AFTER the
    // compute's write action has run, so executor ticks are aggregated
    if (!isCommitted(name)) commit(name, compute, inputs, partitionBy, metrics)
    read(name)
  }

  def uncommit(name: String): Unit =
    Files.deleteIfExists(manifestPath(name))

  // manifest strings are interpolated into JSON: escape them (a table
  // name or metric key with a quote/backslash must not produce an
  // unparseable manifest)
  private def jstr(s: String): String = graft.core.JsonUtil.str(s)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // Files.walk holds directory handles until closed
      val stream = Files.walk(p)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally stream.close()
    }
}
