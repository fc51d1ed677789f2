package graft.pipeline

import graft.core._
import graft.operators._
import graft.sources.Gen
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline over the interleaved document
  * table (SURVEY.md §7 stage order). Each step is a declarative
  * Dataset transformation; Catalyst plans the physical execution.
  *
  * Scale shape: corpus scan → narrow mapPartitions NLP → narrow flatMap
  * path mining → broadcast-join tagging → salted hash aggs for count
  * tables. The only shuffles are the final aggregations; there is no
  * wide join on the document axis, so the plan scales linearly with
  * executors.
  */
object KgPipeline {

  /** The synthetic interleaved corpus, derived deterministically from
    * the driver's `documents` table ids (TESTDATA.md) so an independent
    * SQL oracle can recompute every expected output. */
  def corpus(spark: SparkSession, sfDir: String): Dataset[IceDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
      .map(Gen.doc _)
  }

  def annotated(spark: SparkSession, sfDir: String): Dataset[AnnotatedDoc] =
    Preprocess.annotate(corpus(spark, sfDir))

  def instances(spark: SparkSession, sfDir: String): Dataset[PathInstance] =
    DepPathsStage.instances(annotated(spark, sfDir))

  /** Seed English phrases (resolved repr → path via J4) defining the
    * relation inventory, mirroring the reference's GUI seed-phrase flow
    * (Bootstrap.java:158-199). */
  val seedPhrases: Map[String, String] = Map(
    "livesIn" -> "person lives in gpe",
    "visited" -> "person visited gpe",
    "worksIn" -> "person works in gpe",
    "movedTo" -> "person moved to gpe",
    "bornIn" -> "person was born in gpe",
    "diedIn" -> "person died in gpe")

  def triples(spark: SparkSession, sfDir: String): Dataset[Triple] = {
    val inst = instances(spark, sfDir)
    val repr = DepPathsStage.pathReprTable(inst)
    val rules = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
    TaggerStage.triples(inst, rules)
  }

  /** Span-sequence roundtrip through the preprocess stage: proves the
    * `(kind, text, media_ref, order)` invariant inside the correctness
    * gate, not just in unit tests. */
  def spansRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    annotated(spark, sfDir)
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("ord", "span")))
      .select(col("doc_id"), col("ord"),
        col("span.kind").as("kind"), col("span.text").as("text"),
        col("span.media_ref").as("media_ref"))
}
