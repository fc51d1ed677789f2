package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Stage metric accumulators (north rule: every stage writes
  * per-partition lineage rows AND metric accumulators to the
  * checkpoint table). Registered on the SparkContext so executor-side
  * ticks aggregate driver-side; values land in each commit's manifest
  * via [[TableIO.commit]].
  *
  * Spark accumulator semantics apply: task retries can double-count
  * (at-least-once) — these are progress/observability counters, not
  * correctness inputs, the same contract as the reference's progress
  * monitors (views/swing/ProgressMonitorI.java). */
final class StageMetrics(spark: SparkSession) extends Serializable {
  // Serializable: the accumulator handles close over into executor-side
  // lambdas (accumulators themselves serialize as write-only handles —
  // the standard Spark accumulator contract)
  val docsIn: LongAccumulator = spark.sparkContext.longAccumulator("graft.docs_in")
  val sentences: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.sentences")
  val mentions: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.mentions")
  val pathInstances: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.path_instances")
  val triples: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.triples")

  def snapshot: Map[String, Long] = Map(
    "docs_in" -> docsIn.value,
    "sentences" -> sentences.value,
    "mentions" -> mentions.value,
    "path_instances" -> pathInstances.value,
    "triples" -> triples.value)
}
