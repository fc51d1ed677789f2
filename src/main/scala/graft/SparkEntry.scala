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

  /** Session tuning applied on every query invocation (idempotent).
    * `canChangeCachedPlanOutputPartitioning=true` lets AQE coalesce
    * the shuffle partitions INSIDE cached plans: the per-query
    * persisted intermediates (instance tables, PMI index, dedup
    * signatures) otherwise freeze the static shuffle-partition count
    * into the cache, and every later pass over a few-KB cached frame
    * schedules that many tasks (guide §2.2 — let AQE size partitions
    * by data). Scale-neutral: AQE's advisory size governs, so big
    * cached frames keep big parallelism. Measured (same-JVM A/B,
    * sf0.1): expansion-family queries 0.6-1.2 s -> 0.55-0.9 s, no
    * regressions. */
  private def tune(spark: SparkSession): Unit =
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries0.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => { tune(s); fn(s, dir) })
    }

  private def queries0: Map[String, (SparkSession, String) => DataFrame] = {
    val kg: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_triples" -> ((s, dir) => KgPipeline.triples(s, dir).toDF()),
    "kg_path_types" -> ((s, dir) =>
      graft.operators.DepPathsStage.pathTypesTable(KgPipeline.instances(s, dir))),
    "kg_incremental_paths" -> ((s, dir) =>
      KgPipeline.incrementalPathTypes(s, dir)),
    "kg_stream_incremental" -> ((s, dir) =>
      KgPipeline.streamIncrementalPathTypes(s, dir)),
    "kg_path_instances" -> ((s, dir) =>
      graft.operators.DepPathsStage.pathsTable(KgPipeline.instances(s, dir))),
    "kg_path_ngrams" -> ((s, dir) =>
      graft.operators.DepPathsStage.pathNgramsTable(KgPipeline.instances(s, dir))),
    "kg_spans_roundtrip" -> ((s, dir) => KgPipeline.spansRoundtrip(s, dir)),
    "kg_term_counts" -> ((s, dir) => KgPipeline.termCounts(s, dir)),
    "kg_term_doc_counts" -> ((s, dir) => KgPipeline.termDocCounts(s, dir)),
    "kg_term_rank" -> ((s, dir) => KgPipeline.termRank(s, dir)),
    "kg_term_rank_top10" -> ((s, dir) => KgPipeline.termRankTop10(s, dir)),
    "kg_path_rank" -> ((s, dir) => KgPipeline.pathRank(s, dir)),
    "kg_dep_events" -> ((s, dir) => KgPipeline.depEvents(s, dir)),
    "kg_typeless_pairs" -> ((s, dir) => KgPipeline.typelessPairs(s, dir)),
    "kg_entity_index" -> ((s, dir) => KgPipeline.entityIndex(s, dir)),
    "kg_entity_expansion" -> ((s, dir) => KgPipeline.entityExpansion(s, dir)),
    "kg_entity_expansion_neg" -> ((s, dir) =>
      KgPipeline.entityExpansionNeg(s, dir)),
    "kg_entity_expansion_filtered" -> ((s, dir) =>
      KgPipeline.entityExpansionFiltered(s, dir)),
    "kg_bootstrap_scores" -> ((s, dir) => KgPipeline.bootstrapScores(s, dir)),
    "kg_bootstrap_candidates" -> ((s, dir) =>
      KgPipeline.bootstrapCandidates(s, dir)),
    "kg_events" -> ((s, dir) => KgPipeline.events(s, dir)),
    "kg_event_instances" -> ((s, dir) => KgPipeline.eventInstances(s, dir)),
    "kg_event_repr" -> ((s, dir) => KgPipeline.eventRepr(s, dir)),
    "kg_event_triples" -> ((s, dir) => KgPipeline.eventTriples(s, dir)),
    "kg_rules" -> ((s, dir) => KgPipeline.rulesTable(s, dir)),
    "kg_triples_soft" -> ((s, dir) => KgPipeline.triplesSoft(s, dir)),
    "kg_triple_pr" -> ((s, dir) => KgPipeline.triplePr(s, dir)),
    "kg_triples_emb_soft" -> ((s, dir) => KgPipeline.triplesEmbSoft(s, dir)),
    "kg_canonical_triples" -> ((s, dir) => KgPipeline.canonicalTriples(s, dir)),
    "kg_value_triples" -> ((s, dir) => KgPipeline.valueTriples(s, dir)),
    "kg_symmetric_triples" -> ((s, dir) => KgPipeline.symmetricTriples(s, dir)),
    "kg_coref_triples" -> ((s, dir) => KgPipeline.corefTriples(s, dir)),
    "kg_event_bootstrap_scores" -> ((s, dir) =>
      KgPipeline.eventBootstrapScores(s, dir)),
    "kg_event_emb_scores" -> ((s, dir) => KgPipeline.eventEmbScores(s, dir)),
    "kg_pos_histogram" -> ((s, dir) => KgPipeline.posHistogram(s, dir)),
    "kg_vch_rule_triples" -> ((s, dir) => KgPipeline.vchRuleTriples(s, dir)),
    "kg_fuzzy_rules" -> ((s, dir) => KgPipeline.fuzzyRules(s, dir)),
    "kg_bootstrap_emb_scores" -> ((s, dir) =>
      KgPipeline.bootstrapEmbScores(s, dir)),
    "kg_seed_recommendation" -> ((s, dir) =>
      KgPipeline.seedRecommendation(s, dir)),
    "kg_mira_scores" -> ((s, dir) => KgPipeline.miraScores(s, dir)),
    "kg_mention_pr" -> ((s, dir) => KgPipeline.mentionPr(s, dir)),
    "kg_entity_sim" -> ((s, dir) => KgPipeline.entitySim(s, dir)),
    "kg_edt_dict" -> ((s, dir) => KgPipeline.edtDict(s, dir)),
    "kg_status_roundtrip" -> ((s, dir) => KgPipeline.statusRoundtrip(s, dir)),
    "kg_tuned_costs" -> ((s, dir) => KgPipeline.tunedCosts(s, dir)),
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
          count(lit(1)).as("count_order"))
    }),
    )
    kg ++ DataQueries.queries
  }

  def oracleSql: Map[String, String] = Map(
    "kg_triples" -> OracleSql.kgTriples,
    "kg_path_types" -> OracleSql.kgPathTypes,
    // incremental merge must be indistinguishable from a full recompute
    "kg_incremental_paths" -> OracleSql.kgPathTypes,
    // streamed increment + merge likewise equals the full recompute
    "kg_stream_incremental" -> OracleSql.kgPathTypes,
    "kg_path_instances" -> OracleSql.kgPathInstances,
    "kg_path_ngrams" -> OracleSql.kgPathNgrams,
    "kg_spans_roundtrip" -> OracleSql.kgSpansRoundtrip,
    "kg_term_counts" -> OracleSql.kgTermCounts,
    "kg_term_doc_counts" -> OracleSql.kgTermDocCounts,
    "kg_term_rank" -> OracleSql.kgTermRank,
    "kg_term_rank_top10" -> OracleSql.kgTermRankTop10,
    "kg_path_rank" -> OracleSql.kgPathRank,
    "kg_dep_events" -> OracleSql.kgDepEvents,
    "kg_typeless_pairs" -> OracleSql.kgTypelessPairs,
    "kg_entity_index" -> OracleSql.kgEntityIndex,
    "kg_entity_expansion" -> OracleSql.kgEntityExpansion,
    "kg_entity_expansion_neg" -> OracleSql.kgEntityExpansionNeg,
    "kg_entity_expansion_filtered" -> OracleSql.kgEntityExpansionFiltered,
    "kg_bootstrap_scores" -> OracleSql.kgBootstrapScores,
    "kg_bootstrap_candidates" -> OracleSql.kgBootstrapCandidates,
    "kg_events" -> OracleSql.kgEvents,
    "kg_event_instances" -> OracleSql.kgEventInstances,
    "kg_event_repr" -> OracleSql.kgEventRepr,
    "kg_event_triples" -> OracleSql.kgEventTriples,
    "kg_rules" -> OracleSql.kgRules,
    "kg_triples_soft" -> OracleSql.kgTriplesSoft,
    "kg_triple_pr" -> OracleSql.kgTriplePr,
    "kg_triples_emb_soft" -> OracleSql.kgTriplesEmbSoft,
    "kg_canonical_triples" -> OracleSql.kgCanonicalTriples,
    "kg_value_triples" -> OracleSql.kgValueTriples,
    "kg_symmetric_triples" -> OracleSql.kgSymmetricTriples,
    "kg_coref_triples" -> OracleSql.kgCorefTriples,
    "kg_event_bootstrap_scores" -> OracleSql.kgEventBootstrapScores,
    "kg_event_emb_scores" -> OracleSql.kgEventEmbScores,
    "kg_pos_histogram" -> OracleSql.kgPosHistogram,
    "kg_vch_rule_triples" -> OracleSql.kgVchRuleTriples,
    "kg_fuzzy_rules" -> OracleSql.kgFuzzyRules,
    "kg_bootstrap_emb_scores" -> OracleSql.kgBootstrapEmbScores,
    "kg_seed_recommendation" -> OracleSql.kgSeedRecommendation,
    "kg_mira_scores" -> OracleSql.kgMiraScores,
    "kg_mention_pr" -> OracleSql.kgMentionPr,
    "kg_entity_sim" -> OracleSql.kgEntitySim,
    "kg_edt_dict" -> OracleSql.kgEdtDict,
    "kg_status_roundtrip" -> OracleSql.kgStatusRoundtrip,
    "kg_tuned_costs" -> OracleSql.kgTunedCosts,
    "q1_agg" -> """SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      count(*) AS count_order
      FROM lineitem GROUP BY 1, 2""",
  ) ++ DataQueries.oracles
}
