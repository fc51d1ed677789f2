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

  /** EDT-type dictionary leg of the model export (S12,
    * JetEngineBuilder.java:104-117 buildEDTtypeFile): one
    * `noun | type:type 1` line per entity-set common noun — the third
    * dictionary the reference's engine builder writes beside onoma and
    * rules. Entity sets are (type, nouns-in-list-order) pairs, like the
    * reference's `Ice.entitySets` iteration. */
  def edtTypeDict(spark: SparkSession,
                  entitySets: Seq[(String, Seq[String])]): DataFrame = {
    import spark.implicits._
    entitySets.flatMap { case (tpe, nouns) =>
      nouns.map(n => (n, tpe, s"$n | $tpe:$tpe 1"))
    }.toDF("noun", "etype", "dict_line")
  }

  /** A15 mention-level scorer with the reference's alignment semantics
    * (TypedRelationExtractorScorer.java:45-160):
    *
    *  - entity mentions align by (doc, head END OFFSET); a response
    *    mention whose offset hits an already-consumed key mention is
    *    spurious ("duplicate head")
    *  - a response relation mention CONSUMES at most one key relation
    *    whose aligned argument offsets match in order — or swapped,
    *    when the KEY predicate is in `symmetricPreds` — scoring
    *    `correct` on predicate agreement and `type_error` otherwise;
    *    responses finding no unconsumed key are spurious, leftover keys
    *    missing (one-to-one, like the reference's remove-on-match loop)
    *  - P/R/F count type errors in both denominators, as the reference
    *    does (reportScores)
    *
    * NOTE on parity: within a contended group the reference scans keys
    * in Java HashMap iteration order — effectively ARBITRARY — while
    * this greedy is a deterministic canonicalization of it (same-pred
    * keys first, then any arg-matching key, both in sorted order). On
    * groups with multiple contending keys the correct/type_error split
    * (and thus P/R/F) is one member of the set of outcomes the
    * reference could produce, maximizing `correct`; it is NOT
    * bit-identical to any particular reference run.
    *
    * Entity tables: `(doc_id, head_end)`; relation tables:
    * `(doc_id, pred, a1_end, a2_end)`. Entity alignment is equi-joined
    * on (doc, offset); relation consumption runs per
    * (doc, unordered-arg-pair) cogroup — distributed, no driver-side
    * alignment map. */
  def scoreMentions(keyEnts: DataFrame, respEnts: DataFrame,
                    keyRels: DataFrame, respRels: DataFrame,
                    symmetricPreds: Set[String]): DataFrame = {
    val spark = keyEnts.sparkSession
    import spark.implicits._
    // duplicate response heads: only one aligns, the rest are spurious.
    // One full-outer join + one aggregation = a single job for all three
    // entity counts (the semi/anti/count triple previously ran three)
    val ke = keyEnts.select(col("doc_id"), col("head_end")).distinct()
      .withColumn("in_k", lit(1))
    val reAgg = respEnts.select(col("doc_id"), col("head_end"))
      .groupBy(col("doc_id"), col("head_end"))
      .agg(count(lit(1)).as("r_cnt"))
    val entAgg = ke.join(reAgg, Seq("doc_id", "head_end"), "full_outer")
      .agg(
        coalesce(count(when(col("in_k").isNotNull && col("r_cnt").isNotNull,
          lit(1))), lit(0L)).as("ent_correct"),
        coalesce(sum(col("r_cnt")), lit(0L)).as("ent_resp_total"),
        coalesce(count(when(col("r_cnt").isNull, lit(1))), lit(0L))
          .as("ent_missing"))
    // Relation alignment with the reference's CONSUMPTION semantics
    // (TypedRelationExtractorScorer.java:97-137): each key mention is
    // consumed by at most one response (correct on pred agreement, type
    // error otherwise); a response finding no unconsumed key is
    // spurious; leftover keys are missing. Swap-order matching is
    // allowed when the KEY predicate is symmetric. The reference scans
    // keys in hash order — here the greedy is deterministic: same-pred
    // pairs consume first, then arg-only pairs, both in sorted order.
    // Distributed shape: all rows that can ever contend for each other
    // share one (doc, unordered arg pair) group, so the greedy runs
    // per-group after one shuffle — groups are a handful of rows.
    val symB = spark.sparkContext.broadcast(symmetricPreds)
    // no distinct on EITHER side: the reference iterates mention
    // objects, so two key mentions sharing (pred, offsets) are two
    // consumable keys, symmetric with duplicate responses
    val krT = keyRels.select(col("doc_id"), col("pred"),
        col("a1_end").cast("int"), col("a2_end").cast("int"))
      .as[(String, String, Int, Int)]
    val rrT = respRels.select(col("doc_id"), col("pred"),
        col("a1_end").cast("int"), col("a2_end").cast("int"))
      .as[(String, String, Int, Int)]
    def gkey(t: (String, String, Int, Int)): (String, Int, Int) =
      (t._1, math.min(t._3, t._4), math.max(t._3, t._4))
    val groupCounts = krT.groupByKey(gkey)
      .cogroup(rrT.groupByKey(gkey)) { (_, ks, rs) =>
        val keys = scala.collection.mutable.ArrayBuffer
          .from(ks.toSeq.sortBy(t => (t._2, t._3, t._4)))
        val resps = rs.toSeq.sortBy(t => (t._2, t._3, t._4))
        var correct = 0L; var typeErr = 0L; var spurious = 0L
        def argsMatch(r: (String, String, Int, Int),
                      k: (String, String, Int, Int)): Boolean =
          (k._3 == r._3 && k._4 == r._4) ||
            (symB.value.contains(k._2) && k._3 == r._4 && k._4 == r._3)
        resps.foreach { r =>
          val same = keys.indexWhere(k => k._2 == r._2 && argsMatch(r, k))
          val idx = if (same >= 0) same else keys.indexWhere(k => argsMatch(r, k))
          if (idx >= 0) {
            if (keys(idx)._2 == r._2) correct += 1 else typeErr += 1
            keys.remove(idx)
          } else spurious += 1
        }
        Iterator((correct, typeErr, spurious, keys.length.toLong))
      }
    val relAgg = groupCounts.toDF("c", "t", "s", "m")
      .agg(coalesce(sum(col("c")), lit(0L)), coalesce(sum(col("t")), lit(0L)),
        coalesce(sum(col("s")), lit(0L)), coalesce(sum(col("m")), lit(0L)))
    // ONE action for both scorecard halves: the 1-row entity aggregate
    // and the 1-row relation aggregate cross-joined and collected
    // together — the previous two sequential .first() actions each paid
    // a full plan+schedule round trip
    val row = entAgg.crossJoin(relAgg).first()
    val correctEntN = row.getLong(0)
    val spuriousEntN = row.getLong(1) - correctEntN
    val missingEntN = row.getLong(2)
    val correctRelN = row.getLong(3)
    val typeErrN = row.getLong(4)
    val spuriousRelN = row.getLong(5)
    val missingRelN = row.getLong(6)
    val respN = correctRelN + typeErrN + spuriousRelN
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
    val cols = Seq("doc_id", "subj", "pred", "obj")
    val k = key.select(cols.map(col): _*).distinct()
      .withColumn("in_k", lit(1))
    val r = response.select(cols.map(col): _*).distinct()
      .withColumn("in_r", lit(1))
    // one full-outer join + one aggregation = a single job over each
    // decode, instead of the previous three separate semi/anti-join
    // count actions (each of which re-ran both decode flatMaps)
    val row = k.join(r, cols, "full_outer")
      .agg(
        coalesce(count(when(col("in_k").isNotNull && col("in_r").isNotNull,
          lit(1))), lit(0L)).as("correct"),
        coalesce(count(when(col("in_k").isNull, lit(1))), lit(0L))
          .as("spurious"),
        coalesce(count(when(col("in_r").isNull, lit(1))), lit(0L))
          .as("missing"))
      .first()
    val correct = row.getLong(0)
    val spurious = row.getLong(1)
    val missing = row.getLong(2)
    val spark = key.sparkSession
    import spark.implicits._
    Seq((correct, spurious, missing,
      if (correct + spurious == 0) 0.0 else correct.toDouble / (correct + spurious),
      if (correct + missing == 0) 0.0 else correct.toDouble / (correct + missing)))
      .toDF("correct", "spurious", "missing", "precision", "recall")
  }
}
