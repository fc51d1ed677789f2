package graft.pipeline

import graft.core._
import graft.operators._
import graft.sources.{Gen, TableIO}
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
  *
  * Caching contract: several entry points persist() an intermediate
  * consumed by more than one action (the instance table, the PMI
  * index). The persisted blocks belong to the QUERY, not the session —
  * long-lived callers should release them after the last consuming
  * action (`spark.catalog.clearCache()` between queries, as
  * graft.Verify and graft.Bench do), or the cache accumulates across
  * queries.
  */
object KgPipeline {

  /** The synthetic interleaved corpus, derived deterministically from
    * the driver's `documents` table ids (TESTDATA.md) so an independent
    * SQL oracle can recompute every expected output. */
  // NOTE (round 6, measured): the corpus scan is one small parquet
  // file → a 1-task scan, and the narrow NLP chain runs serially on
  // it. A Fan.out repartition here was tried and REVERTED: at bench
  // scale the per-doc NLP work (~0.2-0.3 s/query total) is cheaper
  // than the 32-task scheduling overhead the fan added to every
  // downstream stage (interleaved same-JVM A/B: e.g. kg_term_rank_top10
  // 0.40 s unfanned vs 1.15 s fanned; kg_mention_pr 1.2 vs 2.8).
  // A production corpus is file-parallel at the scan, so the fan buys
  // nothing there either; heavy-per-row operators that DO profit keep
  // it (Dedup/embedding — see Fan.scala).
  def corpus(spark: SparkSession, sfDir: String): Dataset[IceDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
      .map(Gen.doc _)
  }

  def annotated(spark: SparkSession, sfDir: String): Dataset[AnnotatedDoc] =
    Preprocess.annotate(corpus(spark, sfDir))

  /** Corpus slice by doc_id residue, filtered BEFORE document synthesis
    * and NLP — the fg/bg ranking queries annotate only their slice
    * instead of annotating the whole corpus once per slice. */
  private def corpusSlice(spark: SparkSession, sfDir: String,
                          mod: Long, res: Long): Dataset[IceDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % mod === res)
      .as[Long].map(Gen.doc _)
  }

  /** Complement of [[corpusSlice]] — the corpus MINUS one residue class
    * (the committed-snapshot side of the streamed-increment gate). */
  private def corpusSliceNot(spark: SparkSession, sfDir: String,
                             mod: Long, res: Long): Dataset[IceDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") % mod =!= res)
      .as[Long].map(Gen.doc _)
  }

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
    // persist: the instance table feeds both the seed-rule resolution
    // (an eager collect) and the tagging flatMap — without it the whole
    // NLP + path-mining chain runs once per downstream action. persist
    // (not localCheckpoint) keeps lineage for executor-loss recompute.
    val inst = instances(spark, sfDir).persist()
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

  def termCounts(spark: SparkSession, sfDir: String): DataFrame =
    TermsStage.termCounts(annotated(spark, sfDir))

  def termDocCounts(spark: SparkSession, sfDir: String): DataFrame =
    TermsStage.termDocCounts(annotated(spark, sfDir))

  /** fg/bg term ranking: foreground = docs with id % 4 == 0, background
    * = docs with id % 4 == 2 (both deterministic slices, J1 join). */
  def termRank(spark: SparkSession, sfDir: String): DataFrame = {
    val fg = TermsStage.termCounts(
      Preprocess.annotate(corpusSlice(spark, sfDir, 4, 0)))
    val bg = TermsStage.termCounts(
      Preprocess.annotate(corpusSlice(spark, sfDir, 4, 2)))
    TermsStage.rankTerms(fg, bg)
  }

  /** fg/bg path-type ratio ranking (A8 applied to relations — the
    * reference's rankRelations flow, Corpus.java:241-259 + Ratio.java:
    * 40-50): foreground/background doc slices as in termRank; score =
    * fgCnt·ln(fgCnt)/(bgCnt+1) (J1). No broadcast hint: the bg
    * PATH-TYPE vocabulary is unbounded at web scale, so the join is
    * left to AQE (see TermsStage.rankTerms). */
  def pathRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, log}
    def types(mod: Long, res: Long) =
      DepPathsStage.pathTypesTable(DepPathsStage.instances(
        Preprocess.annotate(corpusSlice(spark, sfDir, mod, res))))
    val fg = types(4, 0)
    val bg = types(4, 2)
      .select(col("type1"), col("path"), col("type2"), col("cnt").as("bg_cnt"))
    fg.join(bg, Seq("type1", "path", "type2"), "left")
      .select(col("type1"), col("path"), col("type2"), col("cnt").as("fg_cnt"),
        graft.functions.Quantize.q6(
          col("cnt") * log(col("cnt").cast("double")) /
            (coalesce(col("bg_cnt"), lit(0L)) + lit(1))).as("score"))
  }

  /** O3 top-K queue (size 10, the reference's recommendation queues,
    * EntitySetExpander.java:266-304,399-410): the ranked term list
    * reduced to its 10 best rows by (score desc, term) — plans as
    * TakeOrderedAndProject, i.e. per-partition bounded heaps merged on
    * the driver, the distributed form of a top-k queue (no full sort,
    * no shuffle of the losers). */
  def termRankTop10(spark: SparkSession, sfDir: String): DataFrame =
    termRank(spark, sfDir)
      .orderBy(col("score").desc, col("term"))
      .limit(10)

  def depEvents(spark: SparkSession, sfDir: String): DataFrame =
    EntitySetStage.depEvents(annotated(spark, sfDir))

  /** Typeless indexing pairs over a term list including a multi-word
    * term — longest-first matching consumes "annual budget" where it
    * occurs, leaving bare "budget" only in unmodified fillers. */
  def typelessPairs(spark: SparkSession, sfDir: String): DataFrame =
    EntitySetStage.typelessEvents(annotated(spark, sfDir),
        terms = Set(Gen.fillNouns(0), Gen.fillNouns(1),
          "annual " + Gen.fillNouns(0)))
      .groupBy(col("term"), col("context"))
      .agg(count(lit(1)).as("cnt"))

  def entityIndex(spark: SparkSession, sfDir: String): DataFrame =
    EntitySetStage.entityIndex(depEvents(spark, sfDir))

  /** Entity-set expansion from two noun seeds (EntitySetExpander flow).
    * The PMI index is persisted: expand() takes two passes over it (seed
    * centroid collect + scoring), and the index itself takes two
    * (marginals + N) — persisting cuts four NLP recomputations to one. */
  def entityExpansion(spark: SparkSession, sfDir: String): DataFrame =
    EntitySetStage.expand(spark, entityIndex(spark, sfDir).persist(),
      seeds = Set(Gen.fillNouns(0), Gen.fillNouns(1)))

  /** A12's negative-seed leg — the reference's reject workflow
    * (EntitySetExpander.java: a user-rejected suggestion joins the
    * negative centroid and the ranking re-scores with the 0.5-weighted
    * penalty). The rejected term is the top-ranked suggestion of the
    * positive-only ranking — deterministic at every scale, and the
    * driver fetch is a bounded top-1 (expand already orders the
    * ranking; limit(1) plans a CollectLimit over it). */
  def entityExpansionNeg(spark: SparkSession, sfDir: String): DataFrame = {
    val idx = entityIndex(spark, sfDir).persist()
    val seeds = Set(Gen.fillNouns(0), Gen.fillNouns(1))
    // empty-corpus guard: no ranking → nothing to reject → pos-only
    val rejected = EntitySetStage.expand(spark, idx, seeds)
      .limit(1).collect().headOption.map(_.getString(0))
    EntitySetStage.expand(spark, idx, seeds, negSeeds = rejected.toSet)
  }

  /** Expansion with the in-loop filters (F9/F10) wired: the cutoff is
    * set high enough (100) to actually drop terms on this corpus —
    * every dobj-side noun falls out of the index, so the expansion
    * centroid is built from the surviving seed alone. */
  def entityExpansionFiltered(spark: SparkSession, sfDir: String): DataFrame =
    EntitySetStage.expandFiltered(spark, depEvents(spark, sfDir),
      seeds = Set(Gen.fillNouns(0), Gen.fillNouns(1)), minTermTotal = 100.0)

  /** Bounded driver-side view of the entity index for the expander
    * gates: top-`top` terms by (rounded) total PMI via a distributed
    * TakeOrderedAndProject, then ONLY those terms' feature rows are
    * collected (the reference caps recommendation input at 20 and
    * trains MIRA driver-side — bounded by design, so the collect is
    * scale-sane). Features are SORTED maps: the expander arithmetic
    * must sum in context order so the independent oracle's dense-vector
    * dot products compare bit-identical doubles. */
  private def topIndexTerms(spark: SparkSession, sfDir: String, top: Int = 20)
      : Seq[graft.functions.Expanders.ScoredTerm] = {
    val idx = entityIndex(spark, sfDir).persist()
    val topTerms = idx.groupBy(col("term"))
      .agg(graft.functions.Quantize.q6(sum(col("pmi"))).as("score"))
      .orderBy(desc("score"), asc("term")).limit(top)
    val rows = idx.join(broadcast(topTerms), Seq("term"))
      .select(col("term"), col("score"), col("context"), col("pmi"))
      .collect()
    rows.groupBy(r => (r.getString(0), r.getDouble(1)))
      .map { case ((t, s), rs) =>
        graft.functions.Expanders.ScoredTerm(t, s,
          scala.collection.immutable.SortedMap.from(
            rs.map(r => r.getString(2) -> r.getDouble(3))))
      }
      .toSeq.sortBy(t => (-t.score, t.term))
  }

  /** A13 surfaced end-to-end: agglomerative seed recommendation
    * (EntitySetExpander.java:61-217,515-617 shape) over the top-20
    * entity-index terms; output = the winning cluster's members,
    * ranked. The DuckDB oracle recomputes every merge step (unrolled)
    * from the same PMI index. */
  def seedRecommendation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rec = graft.functions.Expanders.recommendSeeds(
      topIndexTerms(spark, sfDir))
    rec.zipWithIndex.map { case (t, i) => (i + 1, t) }.toDF("rank", "term")
  }

  /** A14 surfaced end-to-end: binary MIRA
    * (MIRAEntitySetExpander.java:23-144 shape — 50 deterministic
    * epochs) over the entity index, seeds {budget, report} positive,
    * every other indexed term negative; output = each term's
    * final-weight score. Oracle = a DuckDB recursive-CTE recomputation
    * of the identical update sequence. */
  def miraScores(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seeds = Set(Gen.fillNouns(0), Gen.fillNouns(1))
    val terms = topIndexTerms(spark, sfDir).sortBy(_.term)
    val examples = terms.map(t => (t.features, seeds(t.term)))
    val w = graft.functions.Expanders.miraTrain(examples)
    terms.map { t =>
      (t.term, graft.functions.Quantize.q6(
        graft.functions.Expanders.miraScore(w, t.features)))
    }.toDF("term", "mira_score")
  }

  /** Bootstrap shared-arg candidate scores, seeded with the livesIn
    * path (A10/J2/J3). */
  def bootstrapScores(spark: SparkSession, sfDir: String): DataFrame =
    BootstrapStage.sharedArgScores(instances(spark, sfDir),
      seedPaths = Set(Gen.predPaths(0)))

  /** O2 surfaced in the gate: the ranked bootstrap candidate list —
    * norm score floor 0.05, dedupe-by-repr window, cap 200
    * (Bootstrap.java:46-55,262-286). norm_score rounded here for
    * cross-engine hash comparability. */
  def bootstrapCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val inst = instances(spark, sfDir).persist()
    val scores = BootstrapStage.sharedArgScores(inst,
      seedPaths = Set(Gen.predPaths(0)))
    BootstrapStage.candidates(scores, DepPathsStage.pathReprTable(inst))
      .withColumn("norm_score", graft.functions.Quantize.q6(col("norm_score")))
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    EventsStage.eventCounts(EventsStage.events(annotated(spark, sfDir)))

  def eventInstances(spark: SparkSession, sfDir: String): DataFrame =
    EventsStage.eventInstanceCounts(EventsStage.events(annotated(spark, sfDir)))

  def eventRepr(spark: SparkSession, sfDir: String): DataFrame =
    EventsStage.eventReprTable(EventsStage.events(annotated(spark, sfDir)))

  def eventTriples(spark: SparkSession, sfDir: String): DataFrame =
    EventsStage.eventTriples(EventsStage.events(annotated(spark, sfDir)))

  def rules(spark: SparkSession, sfDir: String): Seq[RelationRule] = {
    val repr = DepPathsStage.pathReprTable(instances(spark, sfDir))
    TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
  }

  def rulesTable(spark: SparkSession, sfDir: String): DataFrame =
    Export.rulesTable(spark, rules(spark, sfDir))

  /** Tagging with the diedIn rule removed: those candidates must reach
    * the triple table through the soft matcher (J8) instead — the
    * normalized distance to the bornIn/livesIn/worksIn rules (one word
    * substitution, 0.8/5 = 0.16) is under the 0.5 threshold, and the
    * deterministic (distance, name) tie-break picks bornIn. */
  def triplesSoft(spark: SparkSession, sfDir: String): DataFrame = {
    // one persisted instance table feeds both the seed-rule resolution
    // collect and the tagging flatMap (the NLP + mining chain would
    // otherwise run twice — see triples())
    val inst = instances(spark, sfDir).persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val rs = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
      .filterNot(_.relName == "diedIn")
    TaggerStage.triples(inst, rs).toDF()
  }

  /** Word-embedding table for the embedding-backed soft matcher
    * (PathMatcher.java:16-110 substitution-cost hook): deliberately
    * tiny and ONLY covering {move, work, to, in}, so the effect is
    * isolated — `moved to` paths re-rank from the alphabetical
    * tie-break winner (bornIn) to worksIn purely through embedding
    * similarity. */
  val softMatchEmbedding: Map[String, Array[Double]] = Map(
    "move" -> Array(1.0, 0.0),
    "work" -> Array(0.9, math.sqrt(1 - 0.81)), // cos(move, work) = 0.9
    "to" -> Array(0.0, 1.0),
    "in" -> Array(0.8, 0.6)) // cos(to, in) = 0.6

  /** Tagging with the movedTo rule removed and an embedding-backed
    * `wordSim` in the soft matcher: `moved to` candidates can only
    * reach the triple table through embedding similarity, and the
    * embedding makes worksIn (not the alphabetical-tie bornIn) the
    * nearest rule — i.e. the result is observably different from
    * exact-word soft matching. */
  def triplesEmbSoft(spark: SparkSession, sfDir: String): DataFrame = {
    // one persisted instance table for rule resolution + tagging, as in
    // triples()/triplesSoft()
    val inst = instances(spark, sfDir).persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val rs = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
      .filterNot(_.relName == "movedTo")
    val bc = spark.sparkContext.broadcast(softMatchEmbedding)
    val wordSim: (String, String) => Double = (a, b) => {
      if (a == b) 1.0
      else (bc.value.get(a.toLowerCase), bc.value.get(b.toLowerCase)) match {
        case (Some(x), Some(y)) =>
          val d = x(0) * y(0) + x(1) * y(1)
          val nx = math.sqrt(x(0) * x(0) + x(1) * x(1))
          val ny = math.sqrt(y(0) * y(0) + y(1) * y(1))
          if (nx == 0 || ny == 0) 0.0 else d / nx / ny
        case _ => 0.0
      }
    }
    TaggerStage.triples(inst, rs, wordSim).toDF()
  }

  /** X2 coref surfaced on its own: triples whose mined instance came
    * from a pronoun-subject sentence — the subject decodes to the
    * RESOLVED antecedent entity, never the pronoun. (The same rows are
    * also inside kg_triples; this slice makes the coref path
    * independently hash-verified.) Rules resolve over the FULL corpus
    * repr table; only the tagging input is sliced. */
  def corefTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val inst = instances(spark, sfDir).persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val rs = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
    val pron = inst.filter(col("example").startsWith("He ") ||
      col("example").startsWith("She "))
    TaggerStage.triples(pron, rs).toDF()
  }

  /** A15/J9 surfaced in the gate: triple-level P/R of the
    * withheld-rule decode (diedIn removed, so its candidates soft-match
    * to bornIn — type errors) scored against the full-rule decode as
    * the key. The same distributed semi/anti-join scorer evidences the
    * north-rule "P/R vs reference" metric. One persisted instance
    * table feeds both decodes and the score joins. */
  def triplePr(spark: SparkSession, sfDir: String): DataFrame = {
    val inst = instances(spark, sfDir).persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val all = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
    val key = TaggerStage.triples(inst, all)
    val resp = TaggerStage.triples(inst, all.filterNot(_.relName == "diedIn"))
    Export.score(key.toDF(), resp.toDF())
      .select(col("correct"), col("spurious"), col("missing"),
        graft.functions.Quantize.q6(col("precision")).as("precision"),
        graft.functions.Quantize.q6(col("recall")).as("recall"))
  }

  /** F5 surfaced end-to-end: normalized-POS histogram over every token
    * the NLP stage produces — normalizePos buckets Penn tags to
    * {nnp, nn, vb, o} (DepPaths.java:272-280). One narrow flatMap + one
    * 4-group hash agg; doubles as a tokenizer/POS-tagger audit (any
    * drifted tag shows up as a count mismatch vs the grammar oracle). */
  def posHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    annotated(spark, sfDir)
      .flatMap(d => d.sentences.flatMap(s =>
        s.tokens.map(t => graft.nlp.Nlp.normalizePos(t.pos))))
      .toDF("tag")
      .groupBy(col("tag")).agg(count(lit(1)).as("cnt"))
  }

  /** F14 surfaced end-to-end, load-bearing: an EXTERNALLY-supplied rule
    * whose path still carries a verb-chain hop
    * (RelaxedDepPathRelationTagger.java:85-91 — this pipeline's own
    * mining never emits `:vch:`, so only simplifyForTagging can make
    * such a rule match). The same path is supplied as positive AND
    * negative: if the tagger failed to simplify, no candidate would
    * exact-match, every soft match would be vetoed by the equal-distance
    * same-relation negative (NegDiscount 0.8 < 1), and the output would
    * be EMPTY — the gate rows exist only because both rule paths
    * simplify to the vch-free born path and born candidates exact-match
    * (the exact hash lookup bypasses negatives, like the reference). */
  def vchRuleTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val path = "nsubj-1:be:vch:born:prep:in:pobj"
    val rules = Seq(
      RelationRule("PERSON", path, "GPE", "bornIn", invert = false, positive = true),
      RelationRule("PERSON", path, "GPE", "bornIn", invert = false, positive = false))
    TaggerStage.triples(instances(spark, sfDir), rules).toDF()
  }

  /** O5/J4-fuzzy surfaced end-to-end: a seed phrase with NO exact or
    * swap12 repr match ("person resides in gpe") resolves through the
    * distributed argmin-edit-distance fallback
    * (DepPathMap.java:241-302 findClosestPath). */
  def fuzzyRules(spark: SparkSession, sfDir: String): DataFrame = {
    val repr = DepPathsStage.pathReprTable(instances(spark, sfDir))
    val rules = TaggerStage.rulesFromSeedsFuzzy(spark, repr,
      seedPhrases + ("residesIn" -> "person resides in gpe"))
    Export.rulesTable(spark, rules)
  }

  /** Fixed tiny word embedding for the A11 bootstrap scorer gate — the
    * fixture role Gen plays elsewhere: both engines score against the
    * same vectors, so the oracle hash-verifies real cosine arithmetic. */
  val bootstrapEmbedding: Map[String, Array[Double]] = Map(
    "person" -> Array(1.0, 0.2), "gpe" -> Array(0.2, 1.0),
    "lives" -> Array(0.9, 0.1), "visited" -> Array(0.5, 0.5),
    "works" -> Array(0.8, 0.3), "moved" -> Array(0.6, 0.4),
    "born" -> Array(0.3, 0.8), "died" -> Array(0.2, 0.9),
    "in" -> Array(0.4, 0.1), "to" -> Array(0.1, 0.4),
    "was" -> Array(0.05, 0.05), "toured" -> Array(0.45, 0.55))

  /** A11 surfaced end-to-end: the embedding-centroid bootstrap scorer
    * (IcePath.java:176-191 + WordEmbedding.java:87-128) — candidate
    * score = cosine(seed-repr centroid, repr vector), vectors = sums of
    * word vectors, scored in a narrow map over the repr table. */
  def bootstrapEmbScores(spark: SparkSession, sfDir: String): DataFrame =
    BootstrapStage.embeddingScores(
      DepPathsStage.pathReprTable(instances(spark, sfDir)),
      seedReprs = Set("person lives in gpe"), bootstrapEmbedding)

  /** Every mention head as `(doc_id, head_end)` — the entity tables of
    * the faithful mention scorer. Takes the annotated dataset so the
    * caller can share one NLP pass with the instance mining. */
  private def mentionHeads(ann: Dataset[AnnotatedDoc]): DataFrame = {
    import ann.sparkSession.implicits._
    ann.flatMap(d => d.sentences.flatMap(s =>
        s.names.map(n => (d.doc_id, s.offset + s.tokens(n.head).end))))
      .toDF("doc_id", "head_end")
  }

  /** A15/J9 in the reference-faithful form (the north-rule P/R
    * evidence): `Export.scoreMentions` with head-offset entity and
    * relation-mention tables and the reference's one-to-one CONSUMPTION
    * semantics. Key = full-rule decode (incl. the swap12-resolved
    * marriedBy, decoded INVERTED); response = diedIn withheld (its
    * candidates soft-match bornIn → type errors, counted in both P and
    * R denominators) and marriedBy resolved through the DIRECT seed, so
    * key and response emit the marriage offsets in OPPOSITE order and
    * only the symmetric-predicate swap alignment
    * (TypedRelationExtractorScorer.java:97-137) scores them correct. */
  def mentionPr(spark: SparkSession, sfDir: String): DataFrame = {
    // one NLP pass: the persisted annotated set feeds both the instance
    // mining (rules + decode) and the entity-mention head table —
    // mentionHeads previously re-annotated the corpus from scratch
    val ann = annotated(spark, sfDir).persist()
    val inst = DepPathsStage.instances(ann).persist()
    // ONE rule resolution for BOTH scorer sides: the marriedBy seed is
    // resolved in both argument orders under distinct placeholder names
    // and split driver-side — previously each side ran its own
    // resolve-collect over the repr table
    val all = TaggerStage.rulesFromSeeds(spark,
      DepPathsStage.pathReprTable(inst),
      seedPhrases +
        ("marriedBy#k" -> "person(2) married person(1)") +
        ("marriedBy#r" -> "person(1) married person(2)"))
    def married(tag: String) = all.filter(_.relName == s"marriedBy#$tag")
      .map(_.copy(relName = "marriedBy"))
    val base = all.filterNot(_.relName.startsWith("marriedBy#"))
    val keyRules = base ++ married("k")
    val respRules = base.filterNot(_.relName == "diedIn") ++ married("r")
    // one side-tagged decode pass over the persisted instances feeds
    // both scorer sides (the flatMap previously ran once per side);
    // persisted because scoreMentions consumes each side's filter once
    // but the two filters would otherwise re-run the decode
    val decodes = TaggerStage.mentionDecodesBoth(inst, keyRules, respRules)
      .persist()
    // persisted: the scorer consumes the entity table twice (key + resp
    // sides), and each pass would otherwise re-run the heads flatMap
    // over — and re-decode the nested rows of — the cached annotations
    val ents = mentionHeads(ann).persist()
    Export.scoreMentions(ents, ents,
        decodes.filter(col("side") === "k").drop("side"),
        decodes.filter(col("side") === "r").drop("side"),
        symmetricPreds = Set("marriedBy"))
      .select(col("correct_ents"), col("spurious_ents"), col("missing_ents"),
        col("correct_rels"), col("type_errors"), col("spurious_rels"),
        col("missing_rels"),
        graft.functions.Quantize.q6(col("precision")).as("precision"),
        graft.functions.Quantize.q6(col("recall")).as("recall"),
        graft.functions.Quantize.q6(col("f1")).as("f1"))
  }

  /** The expansion gold set for the simulation scorer: the filler nouns
    * the grammar actually realizes in entity contexts, minus the two
    * seeds — derivable from Gen's arithmetic (dobj-side nouns are
    * fillNouns[(10k+7) % 12] over even ids = the odd residues
    * {report, merger, treaty, festival, verdict, shortage}; the only
    * nsubj-side non-seed noun is drought, since (2k)*3 % 12 ∈ {0, 6}).
    * Plays the role of the reference's user-supplied gold entity file
    * (Simulation.java:80-96). */
  val expansionGold: Seq[String] =
    Seq("drought", "festival", "merger", "shortage", "treaty", "verdict")

  /** Entity-set simulation scorer surfaced end-to-end
    * (entityset/Simulation.java:17-70): per-rank precision / recall and
    * ROC points of the expansion ranking against the gold noun set —
    * `precision_at` = cumulative gold / rank, `recall_at` = cumulative
    * gold / |gold| (the reference's tpr — fn starts at |gold|), `fpr` =
    * cumulative non-gold / (N - |gold|) (tn starts at N - |gold|,
    * rocScore's arithmetic verbatim — N is the FULL ranking size, so
    * the denominators are the reference's even though only the first
    * [[SimAt]] ranks are emitted). The emitted prefix is bounded via a
    * distributed TakeOrderedAndProject before any window runs (the
    * reference's Simulation likewise evaluates capped sizes —
    * Simulation.java:80-83 `sizes = {20}`), so the single-partition
    * cumulative windows only ever see that bounded scoring table, not
    * the index vocabulary. */
  def entitySim(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(desc("score"), asc("term"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val goldN = lit(expansionGold.size.toDouble)
    val ranked = entityExpansion(spark, sfDir)
    // N of the reference's fpr denominator = the FULL ranking size —
    // carried as a 1-row cross join instead of a driver-side count()
    // action, so the whole query is ONE action (the old shape paid a
    // full pass over the expansion chain just to fetch N, then a
    // second for the real result). Same arithmetic bit-for-bit: the
    // count is an exact integer, the subtraction/division run in
    // doubles either way, and the <= gold-size guard (NULL fpr —
    // identical on the DuckDB oracle side) becomes a codegen'd when().
    val nTotalDf = ranked.agg(count(lit(1)).cast("double").as("n_total"))
    boundedRanking(ranked)
      .withColumn("rank", row_number().over(w))
      .withColumn("is_gold", col("term").isin(expansionGold: _*))
      .withColumn("tp", sum(when(col("is_gold"), 1).otherwise(0)).over(cum))
      .crossJoin(nTotalDf)
      .select(col("rank"), col("term"), col("is_gold"),
        graft.functions.Quantize.q6(col("tp") / col("rank"))
          .as("precision_at"),
        graft.functions.Quantize.q6(col("tp") / goldN).as("recall_at"),
        when(col("n_total") > goldN,
          graft.functions.Quantize.q6(
            (col("rank") - col("tp")) / (col("n_total") - goldN)))
          .otherwise(lit(null).cast("double")).as("fpr"))
  }

  /** Emitted-rank cap of [[entitySim]] and of every driver-side collect
    * of the expansion ranking ([[edtDict]], [[statusRoundtrip]]) —
    * shared with the DuckDB oracles so the two sides can never silently
    * disagree on the prefix. */
  val SimAt = 1000

  /** Bounded ranked prefix of an expansion ranking — a distributed
    * TakeOrderedAndProject (per-partition heaps of [[SimAt]] rows,
    * PlanSpec-asserted), so collecting the result stays driver-safe
    * even when the indexed vocabulary is the whole corpus's noun
    * inventory. Mirrors the reference's bounded, human-curated entity
    * set lists (EntitySetExpander caps its queues; Ice.java persists
    * small lists) — an UNbounded expansion collect was the one
    * driver-OOM surface left after round 3. */
  private[graft] def boundedRanking(expansion: DataFrame): DataFrame =
    expansion.orderBy(desc("score"), asc("term")).limit(SimAt)

  /** S12's third dictionary surfaced end-to-end: the EDT-type dict over
    * the DEMO entity set (the two seeds, sorted, then the top-[[SimAt]]
    * expansion ranking) — `noun | DEMO:DEMO 1` lines per
    * JetEngineBuilder.buildEDTtypeFile. The collect is bounded through
    * [[boundedRanking]]; the oracle applies the identical cap. */
  def edtDict(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seeds = Seq(Gen.fillNouns(0), Gen.fillNouns(1)).sorted
    val expanded = boundedRanking(entityExpansion(spark, sfDir))
      .select("term").as[String].collect().toSeq
    Export.edtTypeDict(spark, Seq("DEMO" -> (seeds ++ expanded)))
  }

  /** S11 surfaced end-to-end: the YAML status store round-trip
    * (uicomps/Ice.java persistence — corpora properties, entity sets,
    * relation paths). The status is built from pipeline outputs plus a
    * quoting-stress property (colons, quotes, tabs, a newline), saved
    * through StatusStore's atomic rename, loaded back, and flattened to
    * `(section, name, item_key, item_value)` rows — the DuckDB oracle
    * recomputes the expected table from the parquet corpus, so any
    * quote/escape corruption in the file round-trip surfaces as a hash
    * mismatch. */
  def statusRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // one NLP pass shared by the rule inventory (via instance mining)
    // and the entity-set expansion (via dep events)
    val ann = annotated(spark, sfDir).persist()
    val repr = DepPathsStage.pathReprTable(DepPathsStage.instances(ann))
    // the rule resolution and the expansion ranking are INDEPENDENT
    // driver-blocking jobs off the one cached NLP pass — overlap them
    // (guide §2.6: actions are only sequential because the driver
    // calls them sequentially). The shared ann subtree is narrow (no
    // exchange below the cache), so concurrent first consumers
    // block-lock per partition instead of duplicating work.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val relMapF = Future {
      TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
        .groupBy(_.relName).map { case (rel, rs) =>
          rel -> rs.map(r => s"${r.type1}--${r.path}--${r.type2}").sorted
        }
    }
    // bounded like edtDict: top-SimAt prefix via a distributed top-k,
    // never the full index vocabulary on the driver
    val expandedF = Future {
      boundedRanking(EntitySetStage.expand(spark,
          EntitySetStage.entityIndex(EntitySetStage.depEvents(ann)).persist(),
          seeds = Set(Gen.fillNouns(0), Gen.fillNouns(1))))
        .select("term").as[String].collect().toSeq
    }
    val relMap = Await.result(relMapF, Duration.Inf)
    val expanded = Await.result(expandedF, Duration.Inf)
    val st = graft.sources.IceStatus(
      corpora = Map("main" -> Map(
        "docCount" -> nDocs.toString,
        "source" -> "documents.parquet",
        "note" -> "synthetic: \"interleaved\" corpus\twith\ttabs\nand a newline")),
      entitySets = Map("DEMO" -> expanded),
      relations = relMap)
    val dir = java.nio.file.Files.createTempDirectory("graft-status")
    val path = dir.resolve("ice.yml").toString
    // try/finally: a failing save/load must still delete the temp dir
    // (deleteOnExit on a non-empty directory is a no-op), or repeated
    // bench/verify runs accumulate graft-status dirs — the ice.yml.tmp
    // left by an interrupted atomic rename is swept too
    val rt =
      try {
        graft.sources.StatusStore.save(path, st)
        graft.sources.StatusStore.load(path)
      } finally {
        java.nio.file.Files.deleteIfExists(dir.resolve("ice.yml.tmp"))
        java.nio.file.Files.deleteIfExists(dir.resolve("ice.yml"))
        java.nio.file.Files.deleteIfExists(dir)
      }
    val rows =
      rt.corpora.toSeq.flatMap { case (n, ps) =>
        ps.toSeq.map { case (k, v) => ("corpora", n, k, v) } } ++
      rt.entitySets.toSeq.flatMap { case (n, ms) =>
        ms.zipWithIndex.map { case (m, i) => ("entitySets", n, i.toString, m) } } ++
      rt.relations.toSeq.flatMap { case (n, ps) =>
        ps.zipWithIndex.map { case (p, i) => ("relations", n, i.toString, p) } }
    rows.toDF("section", "name", "item_key", "item_value")
  }

  /** The soft-matcher cost grid search surfaced end-to-end (the
    * tagger's train mode, RelaxedDepPathRelationTagger.java:203-241):
    * with the `visited` rule withheld from the dev rule set, sweep
    * replace/insert/delete over {0.2..1.2}³ (Expanders.tuneCosts) and
    * score each triple's decode against the full-rule decode as the dev
    * key — mention-weighted F1 over the candidate-TYPE table (decode
    * depends only on (type1, path, type2), so the distributed part is
    * the type-count aggregation; the 216-point sweep then runs
    * driver-side over that bounded table, exactly the shape of the
    * reference's driver-side train loop). Output = the winning cost
    * triple + its F1.
    *
    * On this corpus every grid point where the 3-node visit/tour
    * candidates FAIL to soft-match a withheld-relation 5-node rule ties
    * at the maximum F1 (a cross-relation soft match can only produce
    * type errors), so the production costs (0.8, 0.3, 1.2) — outside
    * the sweep lattice but in the no-match regime — achieve the same
    * max F1; the deterministic tie-break (smallest replace, then
    * insert, then delete) selects the smallest no-match lattice point.
    * The DuckDB oracle recomputes the full sweep from closed-form
    * alignment costs that PathsSpec pins to the weighted DP across the
    * entire grid. */
  def tunedCosts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val inst = instances(spark, sfDir).persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val all = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
    val dev = all.filterNot(_.relName == "visited")
    // bounded driver-side view: the sweep scores over DISTINCT candidate
    // types (decode is type-level), capped at the 100k most frequent —
    // a distributed TakeOrderedAndProject, so the collect stays bounded
    // even when the dev corpus's path-type vocabulary is huge. The cap
    // never binds on the fixtures (9 types); when it binds, the F1
    // weighting drops only the rarest types' mentions (the reference's
    // train mode is likewise a driver loop over a bounded dev set).
    val types = inst.groupBy(col("type1"), col("path"), col("type2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("type1"), asc("path"), asc("type2"))
      .limit(100000)
      .as[(String, String, String, Long)].collect()
    // decoders built ONCE per ruleset: the sweep calls them 216 × |types|
    // times, so the rule-state prep must not be rebuilt per call
    val keyDecode = TaggerStage.typeDecoder(all)
    val devDecode = TaggerStage.typeDecoder(dev)
    val keyLabel = types.map { case (t1, p, t2, _) =>
      (t1, p, t2) -> keyDecode(t1, p, t2, graft.functions.Paths.DefaultCosts)
    }.toMap
    def f1(costs: graft.functions.Paths.MatchCosts): Double = {
      var correct = 0L; var respN = 0L; var keyN = 0L
      types.foreach { case (t1, p, t2, cnt) =>
        val k = keyLabel((t1, p, t2))
        val r = devDecode(t1, p, t2, costs)
        if (k.isDefined) keyN += cnt
        if (r.isDefined) respN += cnt
        if (k.isDefined && k == r) correct += cnt
      }
      val pr = if (respN == 0) 0.0 else correct.toDouble / respN
      val rc = if (keyN == 0) 0.0 else correct.toDouble / keyN
      if (pr + rc == 0) 0.0 else 2 * pr * rc / (pr + rc)
    }
    val (best, score) = graft.functions.Expanders.tuneCosts(f1)
    Seq((best.replace, best.insert, best.delete,
      graft.functions.Quantize.q6(score)))
      .toDF("replace_cost", "insert_cost", "delete_cost", "f1")
  }

  def canonicalTriples(spark: SparkSession, sfDir: String): DataFrame =
    Canonicalize.canonicalTriples(triples(spark, sfDir),
      graft.nlp.Nlp.gpeCanonical).toDF()

  /** Value-mention triples (F12 end-to-end): PERSON—paid—MONEY paths
    * tagged by a dedicated seed; the MONEY argument decodes both as its
    * surface and its normalized numeric value (canonical). Reference
    * behavior: DepPaths.java:252-256 + IcePreprocessor.java:572-658. */
  def valueTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val inst = instances(spark, sfDir).filter(col("type2") === "MONEY")
      .persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val rules = TaggerStage.rulesFromSeeds(spark, repr,
      Map("paid" -> "person paid money"))
    TaggerStage.triplesWithCanon(inst, rules).toDF()
      .select(col("doc_id"), col("subj"), col("pred"), col("obj"),
        col("canonical_obj").as("value"))
  }

  /** Symmetric-relation triples via swap12 (F16 end-to-end): the seed
    * phrase is written in the SWAPPED argument order, so it can only
    * resolve through the swap12 join leg and decodes with
    * invert = true — subj/obj come out reversed relative to the mined
    * instance order (the reference's `-1` subtype,
    * DepPathMap.java:115-120 + IceRelation.java:144-153). */
  def symmetricTriples(spark: SparkSession, sfDir: String): DataFrame = {
    val inst = instances(spark, sfDir)
      .filter(col("type1") === "PERSON(1)" && col("type2") === "PERSON(2)")
      .persist()
    val repr = DepPathsStage.pathReprTable(inst)
    val rules = TaggerStage.rulesFromSeeds(spark, repr,
      Map("marriedBy" -> "person(2) married person(1)"))
    require(rules.forall(_.invert),
      "symmetric seed must resolve through the swap12 leg")
    TaggerStage.triples(inst, rules).toDF()
  }

  /** Event-tree bootstrap scores (events/EventBootstrap.java flow),
    * seeded with the visit PERSON/GPE trees; tour trees share their
    * (person, gpe) argument pairs. */
  def eventBootstrapScores(spark: SparkSession, sfDir: String): DataFrame =
    EventBootstrapStage.sharedArgScores(
      EventsStage.events(annotated(spark, sfDir)),
      seedTriggers = Set("visit"), seedType1 = "PERSON", seedType2 = "GPE")

  /** Fixed tiny word embedding for the event-flavored embedding scorer
    * gate (same fixture role as [[bootstrapEmbedding]]): covers the
    * seed tree's words plus a spread of triggers/arg types so scores
    * genuinely separate keys. */
  val eventEmbedding: Map[String, Array[Double]] = Map(
    "visit" -> Array(1.0, 0.1), "tour" -> Array(0.9, 0.2),
    "pay" -> Array(0.2, 0.9), "marry" -> Array(0.1, 1.0),
    "person" -> Array(0.7, 0.3), "gpe" -> Array(0.6, 0.4),
    "money" -> Array(0.1, 0.8),
    "budget" -> Array(0.5, 0.5), "report" -> Array(0.4, 0.6))

  /** Event-flavored embedding scoring surfaced end-to-end
    * (EventBootstrap.java:418-460): tree vector = sum of word vectors
    * of trigger + arg values parsed from the type key, score =
    * cosine(seed-tree centroid, tree) · cnt/(cnt+1), computed in a
    * narrow map over the event-type count table. Oracle recomputes the
    * cosine from the same fixed embedding over the independently
    * derived event-count table. */
  def eventEmbScores(spark: SparkSession, sfDir: String): DataFrame =
    EventBootstrapStage.embeddingScores(events(spark, sfDir),
      seeds = Seq(("visit", Seq("PERSON", "GPE"))), eventEmbedding)

  /** Incremental recompute surfaced in the gate (§2.9, the DepPathsLog
    * analog): the committed instance table is merged with a fresh mine
    * of only the docs touched by a changed entity set; the resulting
    * path-type counts must be indistinguishable from a full recompute —
    * verified against the same independent oracle as kg_path_types. */
  def incrementalPathTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ann = annotated(spark, sfDir).persist()
    // prior persisted too: mergeInstances consumes it twice (the
    // prior-id distinct and the kept-side anti-join) and the path-mining
    // flatMap would otherwise run once per consumer even off cached ann
    // persisted (two merge consumers), but NOT eagerly counted: with
    // the corpus unfanned there is no exchange below this cache, so
    // concurrent cold consumers block-lock per partition instead of
    // duplicating work — an eager count here was measured as a pure
    // extra serial pass. (streamIncrementalPathTypes keeps its count
    // because it overlaps the stream drain for free.)
    val prior = DepPathsStage.instances(ann).persist()
    val merged = IncrementalPaths.mergeInstances(prior, ann,
      changedTokens = Set("chicago", "seattle"))
    DepPathsStage.pathTypesTable(merged.as[PathInstance])
  }

  /** Streamed incremental ingest, end-to-end (gate
    * `kg_stream_incremental`): the corpus minus a deterministic
    * increment slice (doc_id % 5 == 3) is the committed snapshot; the
    * increment is STREAMED in via Trigger.AvailableNow through the
    * checkpointed annotation append
    * ([[graft.streaming.IncrementalIngest.annotateStream]]), and
    * [[IncrementalPaths.mergeInstances]] treats the newly-ingested doc
    * ids as dirty (no cached rows) — the reference's DepPathsLog cache
    * semantics (DepPaths.java:585-676) composed as a streaming
    * pipeline. The merged path-type counts must be indistinguishable
    * from a full recompute over the WHOLE corpus, so the oracle is the
    * same independent kgPathTypes SQL. */
  def streamIncrementalPathTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // committed snapshot: everything except the increment slice.
    // persisted — consumed by the prior-instance mine AND the merge's
    // ann-side legs; without it the NLP chain reruns per consumer.
    val annBase = Preprocess.annotate(corpusSliceNot(spark, sfDir, 5, 3))
      .persist()
    // persisted like incrementalPathTypes' prior: two consumers inside
    // mergeInstances would re-run the mining flatMap otherwise
    val prior = DepPathsStage.instances(annBase).persist()
    // fresh dirs per invocation: a checkpointed append is exactly-once
    // only against ITS checkpoint — reusing dirs across Verify/Bench
    // reps would dedupe the second rep to an empty batch
    val root = java.nio.file.Files.createTempDirectory("graft-stream-inc")
    root.toFile.deleteOnExit()
    val in = root.resolve("in").toString
    val out = root.resolve("ann").toString
    val chk = root.resolve("chk").toString
    corpusSlice(spark, sfDir, 5, 3).toDF()
      .write.mode("overwrite").parquet(in)
    val q = graft.streaming.IncrementalIngest.annotateStream(
      spark, in, out, chk)
    // overlap (guide §2.6): while the stream drains the increment, the
    // committed-side NLP + mining materializes in the same scheduler —
    // this count doubles as the cache fill that keeps mergeInstances'
    // concurrent subtrees from racing a cold prior/annBase cache
    prior.count()
    q.awaitTermination()
    // the drained annotations table joins the committed base; the
    // streamed ids are absent from `prior`, so mergeInstances mines
    // exactly them (changedTokens empty: this gate isolates the
    // new-doc dirty leg; the token-dirty leg is kg_incremental_paths)
    val annStreamed = spark.read
      .schema(org.apache.spark.sql.Encoders.product[AnnotatedDoc].schema)
      .parquet(out).as[AnnotatedDoc]
    val annAll = annBase.unionByName(annStreamed)
    val merged = IncrementalPaths.mergeInstances(prior, annAll,
      changedTokens = Set.empty)
    DepPathsStage.pathTypesTable(merged.as[PathInstance])
  }

  /** Materialized end-to-end run with snapshot/manifest commits: every
    * stage writes through TableIO; a rerun (after a kill) skips every
    * stage whose snapshot is committed and recomputes only the rest. */
  def runAll(spark: SparkSession, sfDir: String, root: String): TableIO =
    runAllDocs(spark, corpus(spark, sfDir), root)

  /** [[runAll]] over an explicit document Dataset — the same staged,
    * committed pipeline for corpora that do not come from the sfDir
    * generator (the RobustnessSpec drives adversarial out-of-grammar
    * corpora through this). */
  def runAllDocs(spark: SparkSession, docs: Dataset[IceDoc],
                 root: String): TableIO = {
    val io = new TableIO(spark, root)
    // north rule: stage metric accumulators — ticked on the executors
    // inside each stage's mapPartitions, captured into every commit's
    // manifest (by-name, read after the write action)
    val metrics = new graft.sources.StageMetrics(spark)
    val ann = io.getOrCompute("annotations", metrics = metrics.snapshot) {
      Preprocess.annotate(docs, Some(metrics)).toDF()
    }
    import spark.implicits._
    val annDs = ann.as[AnnotatedDoc]
    val inst = io.getOrCompute("path_instances", inputs = Seq("annotations"),
      metrics = metrics.snapshot) {
      DepPathsStage.instances(annDs, Some(metrics)).toDF()
    }
    val instDs = inst.as[PathInstance]
    io.getOrCompute("paths", inputs = Seq("path_instances")) {
      DepPathsStage.pathsTable(instDs)
    }
    io.getOrCompute("path_types", inputs = Seq("path_instances")) {
      DepPathsStage.pathTypesTable(instDs)
    }
    val repr = io.getOrCompute("path_repr", inputs = Seq("path_instances")) {
      DepPathsStage.pathReprTable(instDs)
    }
    io.getOrCompute("term_counts", inputs = Seq("annotations")) {
      TermsStage.termCounts(annDs)
    }
    io.getOrCompute("entity_index", inputs = Seq("annotations")) {
      EntitySetStage.entityIndex(EntitySetStage.depEvents(annDs))
    }
    io.getOrCompute("events", inputs = Seq("annotations")) {
      EventsStage.eventCounts(EventsStage.events(annDs))
    }
    // lazy: rule resolution is a real Spark job (persist + two joins +
    // a driver collect) — a fully-committed resume must read tables
    // back without re-running it, and laziness gives exactly that (the
    // only forcers are the "rules"/"triples" compute bodies, which a
    // committed resume never enters)
    lazy val ruleSeq = TaggerStage.rulesFromSeeds(spark, repr, seedPhrases)
    io.getOrCompute("rules", inputs = Seq("path_repr")) {
      Export.rulesTable(spark, ruleSeq)
    }
    // partitioned by predicate (SURVEY §4 physical layout): per-pred
    // partition pruning for downstream graph queries; predicate skew in
    // file sizes is acceptable because files split on read
    val tri = io.getOrCompute("triples", inputs = Seq("path_instances", "rules"),
      partitionBy = Seq("pred"), metrics = metrics.snapshot) {
      TaggerStage.triples(instDs, ruleSeq, metrics = Some(metrics)).toDF()
    }
    io.getOrCompute("canonical_triples", inputs = Seq("triples")) {
      // materialized = true: `tri` is a committed-table scan, so the CC
      // loop's repeated passes re-read cheap parquet — no need for the
      // localCheckpoint copy the flag otherwise buys
      Canonicalize.canonicalTriples(tri.as[Triple], graft.nlp.Nlp.gpeCanonical,
        materialized = true).toDF()
    }
    io
  }
}
