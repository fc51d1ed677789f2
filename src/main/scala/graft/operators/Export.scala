package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage: model export (S12, JetEngineBuilder.java:56-262) — the
  * dictionaries the decoder consumes, as small broadcastable tables:
  *
  *  - `rules`:   `ARG1--path--ARG2 = relName[-1]` lines
  *  - `onoma`:   gazetteer `name \t type` entries
  *
  * and the triple-level P/R scorer (A15,
  * TypedRelationExtractorScorer.java:45-160) as an equi-join + aggs.
  */
object Export {

  def rulesTable(spark: SparkSession, rules: Seq[RelationRule]): DataFrame = {
    import spark.implicits._
    rules.map { r =>
      val suffix = if (r.invert) "-1" else ""
      (s"${r.type1}--${r.path}--${r.type2}", r.relName,
        s"${r.type1}--${r.path}--${r.type2} = ${r.relName}$suffix")
    }.toDF("pattern", "rel_name", "rule_line")
  }

  def onomaTable(spark: SparkSession, gazetteer: Map[String, String],
                 etype: String): DataFrame = {
    import spark.implicits._
    gazetteer.toSeq.map { case (surface, canon) => (surface, canon, etype) }
      .toDF("surface", "canonical", "etype")
  }

  /** A15 mention-level scorer with the reference's alignment semantics
    * (TypedRelationExtractorScorer.java:45-160):
    *
    *  - entity mentions align by (doc, head END OFFSET); a response
    *    mention whose offset hits an already-consumed key mention is
    *    spurious ("duplicate head")
    *  - a response relation mention matches a key relation when its
    *    aligned argument offsets match in order — or swapped, for
    *    predicates in `symmetricPreds` — scoring `correct` on predicate
    *    agreement and `type_error` otherwise; unmatched response rows
    *    are spurious, unconsumed key rows missing
    *  - P/R/F count type errors in both denominators, as the reference
    *    does (reportScores)
    *
    * Entity tables: `(doc_id, head_end)`; relation tables:
    * `(doc_id, pred, a1_end, a2_end)`. All joins are equi-joins on
    * (doc, offset) keys — distributed, no driver-side alignment map. */
  def scoreMentions(keyEnts: DataFrame, respEnts: DataFrame,
                    keyRels: DataFrame, respRels: DataFrame,
                    symmetricPreds: Set[String]): DataFrame = {
    val spark = keyEnts.sparkSession
    import spark.implicits._
    val ke = keyEnts.select(col("doc_id"), col("head_end")).distinct()
    // duplicate response heads: only one aligns, the rest are spurious
    val re = respEnts.select(col("doc_id"), col("head_end"))
    val reDistinct = re.distinct()
    val correctEnts = reDistinct.join(ke, Seq("doc_id", "head_end"), "left_semi")
    val correctEntN = correctEnts.count()
    val spuriousEntN = re.count() - correctEntN
    val missingEntN = ke.join(reDistinct, Seq("doc_id", "head_end"), "left_anti")
      .count()
    // relation alignment: direct-order key + swapped-order key for
    // symmetric predicates; response arg offsets must be aligned
    // entity mentions to begin with (reference maps through
    // entityAlignment — unaligned args can never match a key)
    val kr = keyRels.select(col("doc_id"), col("pred").as("key_pred"),
      col("a1_end"), col("a2_end")).distinct()
    val rr = respRels.select(col("doc_id"), col("pred"), col("a1_end"),
      col("a2_end")).distinct()
    val direct = rr.join(kr, Seq("doc_id", "a1_end", "a2_end"))
    val swapped = rr.filter(col("pred").isin(symmetricPreds.toSeq: _*))
      .join(kr.select(col("doc_id"), col("key_pred"),
          col("a2_end").as("a1_end"), col("a1_end").as("a2_end")),
        Seq("doc_id", "a1_end", "a2_end"))
    val matched = direct.unionByName(swapped)
      .groupBy(col("doc_id"), col("pred"), col("a1_end"), col("a2_end"))
      .agg(max((col("pred") === col("key_pred")).cast("int")).as("type_ok"))
    val correctRelN = matched.filter(col("type_ok") === 1).count()
    val typeErrN = matched.filter(col("type_ok") === 0).count()
    val respN = rr.count()
    val spuriousRelN = respN - correctRelN - typeErrN
    val keyMatched = direct.select(col("doc_id"), col("a1_end"), col("a2_end"))
      .unionByName(swapped.select(col("doc_id"),
        col("a2_end").as("a1_end"), col("a1_end").as("a2_end")))
      .distinct()
    val missingRelN = kr.join(keyMatched, Seq("doc_id", "a1_end", "a2_end"),
      "left_anti").count()
    val precision =
      if (respN == 0) 0.0 else correctRelN.toDouble / respN
    val keyN = correctRelN + typeErrN + missingRelN
    val recall = if (keyN == 0) 0.0 else correctRelN.toDouble / keyN
    val f = if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
    Seq((correctEntN, spuriousEntN, missingEntN, correctRelN, typeErrN,
      spuriousRelN, missingRelN, precision, recall, f))
      .toDF("correct_ents", "spurious_ents", "missing_ents", "correct_rels",
        "type_errors", "spurious_rels", "missing_rels", "precision",
        "recall", "f1")
  }

  /** Triple P/R: equi-join key vs response on all four fields (the
    * simplified surface-level variant; [[scoreMentions]] is the
    * reference-faithful head-offset scorer).
    * Returns one row (correct, spurious, missing, precision, recall). */
  def score(key: DataFrame, response: DataFrame): DataFrame = {
    val k = key.select("doc_id", "subj", "pred", "obj").distinct()
    val r = response.select("doc_id", "subj", "pred", "obj").distinct()
    val cols = Seq("doc_id", "subj", "pred", "obj")
    val correct = r.join(k, cols, "left_semi").count()
    val spurious = r.join(k, cols, "left_anti").count()
    val missing = k.join(r, cols, "left_anti").count()
    val spark = key.sparkSession
    import spark.implicits._
    Seq((correct, spurious, missing,
      if (correct + spurious == 0) 0.0 else correct.toDouble / (correct + spurious),
      if (correct + missing == 0) 0.0 else correct.toDouble / (correct + missing)))
      .toDF("correct", "spurious", "missing", "precision", "recall")
  }
}
