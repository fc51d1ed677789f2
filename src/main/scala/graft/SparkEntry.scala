package graft

import graft.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (then the driver records
  * a rows-only check). Column names are aliased identically on both
  * sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the full KG pipeline (corpus → preprocess → dep paths →
    * seed-rule tagging → triples) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    KgPipeline.triples(spark, "/root/testdata/sf0.001").toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_triples" -> ((s, dir) => KgPipeline.triples(s, dir).toDF()),
    "kg_path_types" -> ((s, dir) =>
      graft.operators.DepPathsStage.pathTypesTable(KgPipeline.instances(s, dir))),
    "kg_path_instances" -> ((s, dir) =>
      graft.operators.DepPathsStage.pathsTable(KgPipeline.instances(s, dir))),
    "kg_spans_roundtrip" -> ((s, dir) => KgPipeline.spansRoundtrip(s, dir)),
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
          count(lit(1)).as("count_order"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "kg_triples" -> OracleSql.kgTriples,
    "kg_path_types" -> OracleSql.kgPathTypes,
    "kg_path_instances" -> OracleSql.kgPathInstances,
    "kg_spans_roundtrip" -> OracleSql.kgSpansRoundtrip,
    "q1_agg" -> """SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      count(*) AS count_order
      FROM lineitem GROUP BY 1, 2""",
  )
}
