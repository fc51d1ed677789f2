package graft.operators

import graft.core.AnnotatedDoc
import graft.nlp.Nlp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stage: distributional entity-set machinery.
  *
  *  - dep-event extraction (X9, EntitySetIndexer.java:375-408): for each
  *    term head, contexts = governing arc `type-1_lemma(governor)` +
  *    governed arcs `type_lemma(dependent)`, stopwords excluded
  *  - context-count matrix (A6) + PMI normalization (A7,
  *    EntitySetIndexer.java:297-343; keep cells > 0.1)
  *  - centroid/cosine expansion scoring (A12,
  *    EntitySetExpander.java:310-397): seed centroid broadcast, cosine
  *    per term, ranked
  */
object EntitySetStage {

  /** `(doc_id, term, context)` dep events. */
  def depEvents(docs: Dataset[AnnotatedDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      d.sentences.flatMap { s =>
        // Set, not Seq.contains: the term list (NP suffixes + name
        // terms) is scanned once per TOKEN in a corpus-wide flatMap
        val termSet = s.terms.toSet
        val termToks = s.tokens.zipWithIndex.collect {
          case (t, i) if termSet(t.word.toLowerCase) => i -> t.word.toLowerCase
        }.toMap
        s.deps.flatMap { a =>
          val gov = termToks.get(a.tgtPos).collect {
            case term if !Nlp.stopwords(a.srcWord.toLowerCase) =>
              (d.doc_id, term, s"${a.dep}-1_${Nlp.lemma(a.srcWord)}")
          }
          val dep = termToks.get(a.srcPos).collect {
            case term if !Nlp.stopwords(a.tgtWord.toLowerCase) =>
              (d.doc_id, term, s"${a.dep}_${Nlp.lemma(a.tgtWord)}")
          }
          gov.toSeq ++ dep.toSeq
        }
      }
    }.toDF("doc_id", "term", "context")
  }

  /** Typeless entity-set indexer
    * (entityset/TypelessEntitySetIndexer.java:101-204): no pre-declared
    * entity type — the TERM LIST itself (output of the terminology
    * stage) is gazetteer-loaded and matched longest-first over token
    * sequences; each match emits its head token's dependency contexts
    * as `(term, context)` training pairs (the word2vecf-style output),
    * whitespace normalized to `_`. The term list is broadcast; the scan
    * is a narrow flatMap. */
  def typelessEvents(docs: Dataset[AnnotatedDoc],
                     terms: Set[String]): DataFrame = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast {
      terms.map(t => t.toLowerCase.split("\\s+").toVector)
        .groupBy(_.head).view.mapValues(_.toSeq.sortBy(-_.length)).toMap
    }
    docs.flatMap { d =>
      val byFirst = bc.value
      d.sentences.flatMap { s =>
        val words = s.tokens.map(_.word.toLowerCase).toVector
        val out = Vector.newBuilder[(String, String, String)]
        var i = 0
        while (i < words.length) {
          val matched = byFirst.get(words(i)).flatMap(_.find(seq =>
            seq.length <= words.length - i &&
              seq.indices.forall(k => words(i + k) == seq(k))))
          matched match {
            case Some(seq) =>
              val head = i + seq.length - 1
              val term = seq.mkString("_")
              s.deps.foreach { a =>
                if (a.tgtPos == head && !Nlp.stopwords(a.srcWord.toLowerCase))
                  out += ((d.doc_id, term, s"${a.dep}-1_${Nlp.lemma(a.srcWord)}"))
                if (a.srcPos == head && !Nlp.stopwords(a.tgtWord.toLowerCase))
                  out += ((d.doc_id, term, s"${a.dep}_${Nlp.lemma(a.tgtWord)}"))
              }
              i += seq.length
            case None => i += 1
          }
        }
        out.result()
      }
    }.toDF("doc_id", "term", "context")
  }

  /** PMI matrix (A7): cell -> ln(cnt / rowSum / prior), prior =
    * ctxTotal / N; keep > 0.1 (EntitySetIndexer.java:325-356). Pure
    * built-in aggs: one count matrix, two marginals joined back. PMI
    * rounded to 6 dp for cross-engine comparability. */
  /** @param minTermTotal F10 (EntitySetIndexer.java:107-116): index only
    *   entities whose total count exceeds the cutoff (reference default
    *   3.0); marginals and N are recomputed over the kept cells. */
  def entityIndex(events: DataFrame, minTermTotal: Double = 0.0): DataFrame = {
    // persisted: consumed four times below (two marginals, the N scalar
    // action, and the final join) — otherwise the upstream NLP + flatMap
    // chain re-executes for each
    val cells0 = events.groupBy(col("term"), col("context"))
      .agg(count(lit(1)).as("cnt"))
    val cells = (if (minTermTotal <= 0) cells0
      else {
        val kept = cells0.groupBy(col("term"))
          .agg(sum(col("cnt")).as("tt"))
          .filter(col("tt") > minTermTotal).select(col("term"))
        cells0.join(kept, Seq("term"))
      }).persist()
    val rowTotals = cells.groupBy(col("term"))
      .agg(sum(col("cnt")).as("row_total"))
    val ctxTotals = cells.groupBy(col("context"))
      .agg(sum(col("cnt")).as("ctx_total"))
    // coalesce: sum() over zero cells is null (e.g. the cutoff filtered
    // every term), which must yield an empty index, not an NPE
    val n = cells.agg(coalesce(sum(col("cnt")), lit(0L)))
      .first().getLong(0).toDouble
    // no broadcast hint on ctxTotals: the context VOCABULARY is unbounded
    // at web scale (unlike the per-query seed/rule tables that stay
    // hinted), so the join is left to AQE — it still broadcasts a small
    // side at runtime and falls back to a shuffled hash join when the
    // vocabulary outgrows an executor
    cells.join(rowTotals, "term")
      .join(ctxTotals, "context")
      // quantized engine-portably (Quantize.q6): the pmi value feeds the
      // 0.1 cut AND every downstream centroid/score sum, so a Spark/
      // DuckDB round()-tie flip here would cascade through the whole
      // expansion family
      .withColumn("pmi", graft.functions.Quantize.q6(
        log(col("cnt") / col("row_total") / (col("ctx_total") / lit(n)))))
      .filter(col("pmi") > 0.1)
      .select(col("term"), col("context"), col("cnt"), col("pmi"))
  }

  /** Expansion scoring (A12): centroid = sum of seed PMI vectors,
    * computed DISTRIBUTED (seeds are a handful, but the contexts a
    * web-scale seed occurs in are not — collecting its context vector
    * onto the driver is the same unbounded materialization the
    * expansion-ranking collects were cured of); score = cosine with a
    * 0.5-weighted negative-centroid penalty when negatives are given;
    * ranked descending with a total tiebreak. The centroid norms ride
    * along as a 1-row cross join (NOT a driver .first(): that would
    * launch the whole PMI-index job eagerly at plan-construction time,
    * and twice per expand); the centroid joins the index under AQE (no
    * broadcast hint — same unbounded-vocabulary discipline as the
    * ctxTotals join above). The score is quantized engine-portably
    * (Quantize.q6) rather than round()ed: the ranking (and the
    * negative-seed leg's top-1 rejection) cuts on this value, and a
    * round()-at-a-tie flip between Spark and the DuckDB oracle would
    * change WHICH term wins, not just a last digit. */
  def expand(spark: SparkSession, index: DataFrame, seeds: Set[String],
             negSeeds: Set[String] = Set.empty, gamma: Double = 0.5): DataFrame = {
    import spark.implicits._
    def centroidDf(of: Set[String], out: String): DataFrame =
      if (of.isEmpty) Seq.empty[(String, Double)].toDF("context", out)
      else index.filter(col("term").isin(of.toSeq: _*))
        .groupBy(col("context")).agg(sum(col("pmi")).as(out))
    // persist: consumed twice per action (the norm aggregate and the
    // scoring join) and Catalyst does not reuse the subtree across
    // consumers — without it the two centroid groupBys over the index
    // plus their full-outer join run once per consumer. Small by
    // construction (one row per context of the handful of seed terms);
    // released by the caller's clearCache like every per-query cache.
    val cenDf = centroidDf(seeds, "cen_pos")
      .join(centroidDf(negSeeds, "cen_neg"), Seq("context"), "full_outer")
      .persist()
    val normDf = cenDf.agg(
      coalesce(sqrt(sum(pow(coalesce(col("cen_pos"), lit(0.0)), 2))),
        lit(0.0)).as("norm_p"),
      coalesce(sqrt(sum(pow(coalesce(col("cen_neg"), lit(0.0)), 2))),
        lit(0.0)).as("norm_n"))
    val perTerm = index.join(cenDf, Seq("context"), "left")
      .groupBy(col("term"))
      .agg(sum(col("pmi") * coalesce(col("cen_pos"), lit(0.0))).as("dot_pos"),
           sum(col("pmi") * coalesce(col("cen_neg"), lit(0.0))).as("dot_neg"),
           sqrt(sum(col("pmi") * col("pmi"))).as("norm"))
      .crossJoin(normDf)
    val posCos = when(col("norm_p") === 0, lit(0.0))
      .otherwise(col("dot_pos") / col("norm") / col("norm_p"))
    val negCos = when(col("norm_n") === 0, lit(0.0))
      .otherwise(col("dot_neg") / col("norm") / col("norm_n"))
    perTerm
      .withColumn("score",
        graft.functions.Quantize.q6(posCos - lit(gamma) * negCos))
      .filter(!col("term").isin(seeds.toSeq: _*))
      .select(col("term"), col("score"))
      .orderBy(desc("score"), asc("term"))
  }

  /** F9 seed-candidate exclusions as codegen'd column predicates
    * (EntitySetExpander.java:86-112): derivational -tion/-ment nouns,
    * URLs/emails, capitalized terms, previously suggested terms. */
  def candidateAllowed(suggested: Set[String] = Set.empty) = {
    val t = col("term")
    // length > 0 mirrors the reference's explicit empty-string reject
    // (EntitySetExpander.java:97) and the scalar twin's term.nonEmpty
    val base = length(t) > 0 &&
      !t.endsWith("tion") && !t.endsWith("ment") &&
      !t.startsWith("www.") && !t.startsWith("http") && !t.contains("@") &&
      substring(t, 1, 1) === lower(substring(t, 1, 1))
    if (suggested.isEmpty) base else base && !t.isin(suggested.toSeq: _*)
  }

  /** Expansion with the in-loop filters wired (F9 + F10): the index is
    * cut to entities above `minTermTotal`, and candidates failing the
    * seed-candidate rules are dropped from the ranked output. */
  def expandFiltered(spark: SparkSession, events: DataFrame,
                     seeds: Set[String], minTermTotal: Double = 3.0,
                     suggested: Set[String] = Set.empty): DataFrame =
    expand(spark, entityIndex(events, minTermTotal).persist(), seeds)
      .filter(candidateAllowed(suggested))
}
