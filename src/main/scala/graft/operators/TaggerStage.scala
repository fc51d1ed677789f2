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
    * (J4, DepPathMap.java:96-109): join tiny seed set against the repr
    * table on normalized repr (+ the swap12 variant for symmetric
    * types), then collect the (small) rule set to the driver for
    * broadcast. */
  def rulesFromSeeds(spark: SparkSession, pathRepr: DataFrame,
                     seeds: Map[String, String]): Seq[RelationRule] = {
    import spark.implicits._
    val seedDf = seeds.toSeq.toDF("relName", "seedRepr")
      .withColumn("seedRepr", lower(regexp_replace(col("seedRepr"), "\\s+", " ")))
    val joined = pathRepr
      .join(broadcast(seedDf), col("repr") === col("seedRepr"))
      .select("type1", "path", "type2", "relName")
    joined.collect().map { r =>
      RelationRule(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), invert = false, positive = true)
    }.toSeq
  }

  /** Tag candidate path instances against broadcast rules and emit
    * triples. Exact match first; soft match (threshold 0.5, neg-rule
    * discount 0.8) as fallback. A narrow map stage — no shuffle. */
  def triples(candidates: Dataset[PathInstance],
              rules: Seq[RelationRule]): Dataset[Triple] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast {
      val pos = rules.filter(_.positive)
      val exact = pos.map(r => (r.type1, r.path, r.type2) -> r).toMap
      val soft = pos.map(r => (s"${r.type1}--${r.path}--${r.type2}", r.relName))
      val neg = rules.filterNot(_.positive)
        .map(r => (s"${r.type1}--${r.path}--${r.type2}", r.relName))
      (exact, soft, neg)
    }
    candidates.flatMap { c =>
      val (exact, soft, neg) = bc.value
      val simplified = Paths.simplifyForTagging(c.path)
      val hit = exact.get((c.type1, simplified, c.type2)) match {
        case Some(r) => Some((r.relName, r.invert))
        case None =>
          Paths.softMatch(s"${c.type1}--$simplified--${c.type2}", soft, neg)
            .map(rel => (rel, false))
      }
      hit.map { case (rel, invert) =>
        if (invert) Triple(c.doc_id, c.arg2, rel, c.arg1)
        else Triple(c.doc_id, c.arg1, rel, c.arg2)
      }
    }
  }
}
