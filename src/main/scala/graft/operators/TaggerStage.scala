package graft.operators

import graft.core._
import graft.functions.Paths
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Relation rule: `TYPE1--path--TYPE2 → relName`, with `invert` swapping
  * argument order at decode (the reference's `-1` subtype,
  * RelaxedDepPathRelationTagger.java:115-128; rule export format
  * JetEngineBuilder.java:200-231). */
final case class RelationRule(type1: String, path: String, type2: String,
                              relName: String, invert: Boolean,
                              positive: Boolean)

/** Stage: the triple emitter. Candidate mention-pair paths are matched
  * against the (small, broadcast) rule table — exact hash lookup first
  * (J7), weighted-edit-distance soft match as fallback (J8) — and each
  * hit emits a `(subj, pred, obj)` triple. This replaces the reference's
  * per-doc APF writing (RelaxedDepPathRelationTagger.java:131-264) with
  * a distributed broadcast-join over the candidates table: the rules are
  * ≤ hundreds of rows, so the join never shuffles the big side.
  */
object TaggerStage {

  /** Resolve seed English phrases to rules via the path_repr table
    * (J4, DepPathMap.java:96-109): join the tiny seed set against the
    * repr table on normalized repr, PLUS the swap12 variant for
    * symmetric-type paths (F16, DepPathMap.java:115-120) — a seed
    * phrase written in the swapped argument order resolves to the same
    * path with `invert = true` (the reference's `-1` subtype decode,
    * IceRelation.java:144-153). The swapped leg is suppressed when
    * swap12 is the identity (no subscripts), so asymmetric-type rules
    * are not duplicated. The (small) rule set is collected to the
    * driver for broadcast. */
  def rulesFromSeeds(spark: SparkSession, pathRepr: DataFrame,
                     seeds: Map[String, String]): Seq[RelationRule] = {
    import spark.implicits._
    val seedDf = seeds.toSeq.toDF("relName", "seedRepr")
      .withColumn("seedRepr", lower(trim(regexp_replace(col("seedRepr"), "\\s+", " "))))
    // swap12 as a column expression: (1) <-> (2) via a placeholder
    val swapped = regexp_replace(regexp_replace(regexp_replace(
      col("repr"), "\\(1\\)", "(#)"), "\\(2\\)", "(1)"), "\\(#\\)", "(2)")
    // persist: BOTH join legs consume the repr subtree (an aggregation
    // over the mined instances); without it the repr agg runs twice per
    // resolution. Ownership: a frame the CALLER already persisted (e.g.
    // a scorer resolving two rule sets from one repr) is left alone;
    // one this function persisted is released before returning — the
    // collect below is the last consumer, and callers that never
    // clearCache (ScalingBench's pipeline mode, long-lived test
    // sessions) must not accumulate a cached repr per resolution.
    val weOwn =
      pathRepr.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val repr = if (weOwn) pathRepr.persist() else pathRepr
    // two equi-joins (each a BroadcastHashJoin), not one OR-join (which
    // would plan as a nested loop over the whole repr table)
    val direct = repr
      .join(broadcast(seedDf), col("repr") === col("seedRepr"))
      .select(col("type1"), col("path"), col("type2"), col("relName"),
        lit(false).as("invert"))
    val viaSwap = repr.withColumn("swap_repr", swapped)
      .join(broadcast(seedDf),
        col("swap_repr") === col("seedRepr") && col("repr") =!= col("seedRepr"))
      .select(col("type1"), col("path"), col("type2"), col("relName"),
        lit(true).as("invert"))
    val joined = direct.unionByName(viaSwap)
    val rules = joined.collect().map { r =>
      RelationRule(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), invert = r.getBoolean(4), positive = true)
    }.toSeq
    if (weOwn) repr.unpersist(blocking = false)
    rules
  }

  /** Like [[rulesFromSeeds]], plus the J4 edit-distance fallback
    * (DepPathMap.java:241-302 findClosestPath): a seed phrase with no
    * exact/swap12 repr match resolves to the argmin-edit-distance repr
    * instead. The argmin runs DISTRIBUTED — tiny seed set crossed
    * against the repr table, min-reduced per seed — so the repr table
    * is never collected. */
  def rulesFromSeedsFuzzy(spark: SparkSession, pathRepr: DataFrame,
                          seeds: Map[String, String]): Seq[RelationRule] = {
    val exactRules = rulesFromSeeds(spark, pathRepr, seeds)
    val unresolved = seeds -- exactRules.map(_.relName).toSet
    if (unresolved.isEmpty) return exactRules
    import spark.implicits._
    val seedDf = unresolved.toSeq.toDF("relName", "seedRepr")
      .withColumn("seedRepr", lower(trim(regexp_replace(col("seedRepr"), "\\s+", " "))))
    val dist = udf((a: String, b: String) => Paths.editDistance(a, b))
    val scored = pathRepr.crossJoin(broadcast(seedDf))
      .select(col("relName"), col("type1"), col("path"), col("type2"),
        dist(col("repr"), col("seedRepr")).as("d"), col("repr"))
    // deterministic argmin per seed: (distance, repr, path) min-struct
    val best = scored.groupBy(col("relName"))
      .agg(min(struct(col("d"), col("repr"), col("type1"), col("path"),
        col("type2"))).as("m"))
      .select(col("relName"), col("m.type1"), col("m.path"), col("m.type2"))
    exactRules ++ best.collect().map { r =>
      RelationRule(r.getString(1), r.getString(2), r.getString(3),
        r.getString(0), invert = false, positive = true)
    }
  }

  /** The broadcastable decode state: exact rule map + soft/neg rule
    * lists (J7/J8) + the invert flag of each soft rule (keyed by
    * (path key, relName) — the matched rule's identity, so swap12
    * rules reached through the soft matcher still decode swapped).
    * Rule paths go through the same simplification as candidates, so
    * an externally-supplied rule carrying vch hops can exact-match the
    * vch-free candidates this pipeline mines. */
  private def ruleState(rules: Seq[RelationRule])
      : (Map[(String, String, String), RelationRule],
         Seq[(String, String)], Seq[(String, String)],
         Map[(String, String), Boolean]) = {
    val pos = rules.filter(_.positive)
      .map(r => r.copy(path = Paths.simplifyForTagging(r.path)))
    val exact = pos.map(r => (r.type1, r.path, r.type2) -> r).toMap
    val soft = pos.map(r => (s"${r.type1}--${r.path}--${r.type2}", r.relName))
    val invertBy = pos.map(r =>
      (s"${r.type1}--${r.path}--${r.type2}", r.relName) -> r.invert).toMap
    val neg = rules.filterNot(_.positive)
      .map(r => r.copy(path = Paths.simplifyForTagging(r.path)))
      .map(r => (s"${r.type1}--${r.path}--${r.type2}", r.relName))
    (exact, soft, neg, invertBy)
  }

  /** Decode one candidate against the rule state: exact hash lookup
    * first, weighted-edit-distance soft match as fallback. Returns
    * (relName, invert) — invert comes from the MATCHED rule on both
    * paths, so a swap12-resolved rule keeps its orientation when it
    * matches softly. */
  private def decode(c: PathInstance,
                     state: (Map[(String, String, String), RelationRule],
                             Seq[(String, String)], Seq[(String, String)],
                             Map[(String, String), Boolean]),
                     wordSim: (String, String) => Double)
      : Option[(String, Boolean)] = {
    val (exact, soft, neg, invertBy) = state
    val simplified = Paths.simplifyForTagging(c.path)
    exact.get((c.type1, simplified, c.type2)) match {
      case Some(r) => Some((r.relName, r.invert))
      case None =>
        Paths.softMatchWithKey(s"${c.type1}--$simplified--${c.type2}", soft,
            neg, wordSim)
          .map { case (key, rel) =>
            (rel, invertBy.getOrElse((key, rel), false))
          }
    }
  }

  private val exactSim: (String, String) => Double =
    (x, y) => if (x == y) 1.0 else 0.0

  /** Precompute the simplified rule state once and return a TYPE-LEVEL
    * decoder — the relation label every candidate of a
    * `(type1, path, type2)` receives, with configurable soft-matcher
    * costs: the scoring primitive of the train mode's cost grid search
    * (RelaxedDepPathRelationTagger.java:203-241 drives the sweep
    * against the dev-set scorer; the decode itself is the same
    * exact-then-soft cascade as [[triples]]). The sweep calls the
    * decoder grid × types times, so the per-ruleset prep (path
    * simplification, exact map, soft/neg lists) is hoisted out here
    * rather than rebuilt per call. */
  def typeDecoder(rules: Seq[RelationRule])
      : (String, String, String, Paths.MatchCosts) => Option[String] = {
    val pos = rules.filter(_.positive)
      .map(r => r.copy(path = Paths.simplifyForTagging(r.path)))
    val exact = pos.map(r => (r.type1, r.path, r.type2) -> r.relName).toMap
    val soft = pos.map(r => (s"${r.type1}--${r.path}--${r.type2}", r.relName))
    val neg = rules.filterNot(_.positive)
      .map(r => r.copy(path = Paths.simplifyForTagging(r.path)))
      .map(r => (s"${r.type1}--${r.path}--${r.type2}", r.relName))
    (type1, path, type2, costs) => {
      val simplified = Paths.simplifyForTagging(path)
      exact.get((type1, simplified, type2)).orElse(
        Paths.softMatch(s"$type1--$simplified--$type2", soft, neg,
          costs = costs))
    }
  }

  /** One-shot convenience over [[typeDecoder]]. */
  def decodeType(rules: Seq[RelationRule], type1: String, path: String,
                 type2: String,
                 costs: Paths.MatchCosts = Paths.DefaultCosts)
      : Option[String] =
    typeDecoder(rules)(type1, path, type2, costs)

  /** Tag candidate path instances against broadcast rules and emit
    * triples. Exact match first; soft match (threshold 0.5, neg-rule
    * discount 0.8) as fallback — `wordSim` plugs an embedding-backed
    * word similarity into the soft matcher's substitution cost
    * (PathMatcher.java:16-110). A narrow map stage — no shuffle. */
  def triples(candidates: Dataset[PathInstance],
              rules: Seq[RelationRule],
              wordSim: (String, String) => Double = exactSim,
              metrics: Option[graft.sources.StageMetrics] = None)
      : Dataset[Triple] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ruleState(rules))
    candidates.flatMap { c =>
      val t = decode(c, bc.value, wordSim).map { case (rel, invert) =>
        if (invert) Triple(c.doc_id, c.arg2, rel, c.arg1)
        else Triple(c.doc_id, c.arg1, rel, c.arg2)
      }
      metrics.foreach(m => if (t.isDefined) m.triples.add(1))
      t
    }
  }

  /** Both scorer sides decoded in ONE narrow pass — the mention-level
    * decode view for the reference-faithful scorer (A15/J9). Each
    * decoded candidate emits (side, doc_id, pred, a1_end, a2_end):
    * head END char offsets in DECODED argument order (swapped when the
    * matched rule is inverted), the alignment key of the reference's
    * APF relation mentions (TypedRelationExtractorScorer.java:53-80).
    * Each candidate runs
    * against the key AND response rule states and emits side-tagged
    * mention rows ("k"/"r"). Halves the candidate passes of the P/R
    * scorer — the per-candidate soft-match DP is the dominant decode
    * cost, and the two rule sets share most of it only in the sense
    * that one scan of the (persisted) instance table now feeds both. */
  def mentionDecodesBoth(candidates: Dataset[PathInstance],
                         keyRules: Seq[RelationRule],
                         respRules: Seq[RelationRule],
                         wordSim: (String, String) => Double = exactSim)
      : DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bcK = spark.sparkContext.broadcast(ruleState(keyRules))
    val bcR = spark.sparkContext.broadcast(ruleState(respRules))
    candidates.flatMap { c =>
      def side(tag: String,
               st: (Map[(String, String, String), RelationRule],
                    Seq[(String, String)], Seq[(String, String)],
                    Map[(String, String), Boolean])) =
        decode(c, st, wordSim).map { case (rel, invert) =>
          if (invert) (tag, c.doc_id, rel, c.end2, c.end1)
          else (tag, c.doc_id, rel, c.end1, c.end2)
        }
      side("k", bcK.value) ++ side("r", bcR.value)
    }.toDF("side", "doc_id", "pred", "a1_end", "a2_end")
  }

  /** Like [[triples]] but keeps the canonical argument forms — value
    * mentions decode to their normalized numeric value (F12), names to
    * their gazetteer canonical. */
  def triplesWithCanon(candidates: Dataset[PathInstance],
                       rules: Seq[RelationRule],
                       wordSim: (String, String) => Double = exactSim)
      : Dataset[CanonTriple] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ruleState(rules))
    candidates.flatMap { c =>
      decode(c, bc.value, wordSim).map { case (rel, invert) =>
        if (invert) CanonTriple(c.doc_id, c.arg2, rel, c.arg1, c.canon2, c.canon1)
        else CanonTriple(c.doc_id, c.arg1, rel, c.arg2, c.canon1, c.canon2)
      }
    }
  }
}
