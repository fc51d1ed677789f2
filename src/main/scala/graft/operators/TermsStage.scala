package graft.operators

import graft.core.AnnotatedDoc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage: terminology extraction + ranking.
  *
  *  - term candidates per NP come out of the preprocess stage (X8/F7,
  *    TermCounter.java:224-252)
  *  - doc/total frequency aggregation (A3, TermCounter.java:166-212) as
  *    a hash agg with automatic partial/final
  *  - fg/bg ratio ranking (A8/A9, Ratio.java:40-50 +
  *    TermRanker.java:21-92) as a broadcast join + column expression
  */
object TermsStage {

  /** `(doc_id, term)` occurrences. */
  def termOccurrences(docs: Dataset[AnnotatedDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => d.sentences.flatMap(s => s.terms.map(t => (d.doc_id, t))))
      .toDF("doc_id", "term")
  }

  /** `term_counts` table (A3): docFreq = distinct docs, totalFreq = all
    * occurrences. Exact distinct, as in the reference. */
  def termCounts(docs: Dataset[AnnotatedDoc]): DataFrame =
    termOccurrences(docs)
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"),
           count(lit(1)).as("total_freq"))

  /** Ratio ranking (A9, TermRanker.java:84-88 with alpha=1 and +1
    * smoothing): score = fgDocFreq * ln(fgDocFreq) / (bgDocFreq + 1).
    * bg side is broadcast — a dimension-table join (J1). Score rounded
    * to 6 dp for cross-engine comparability. */
  def rankTerms(fg: DataFrame, bg: DataFrame): DataFrame = {
    val bgc = broadcast(bg.select(col("term").as("bg_term"),
      col("doc_freq").as("bg_doc_freq")))
    fg.join(bgc, col("term") === col("bg_term"), "left")
      .withColumn("score",
        round(col("doc_freq") * log(col("doc_freq").cast("double")) /
          (coalesce(col("bg_doc_freq"), lit(0L)) + lit(1)), 6))
      .select(col("term"), col("doc_freq"), col("total_freq"), col("score"))
  }
}
