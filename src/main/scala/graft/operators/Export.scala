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

  /** Triple P/R: equi-join key vs response on all four fields (the
    * reference aligns by doc + head offset; surfaces are exact here).
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
