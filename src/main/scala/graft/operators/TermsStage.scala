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

  /** A3 per-doc leg (flat): `(term, doc_id, cnt)` — the reference's
    * rawCount information (TermCounter.java:141-154) in relational
    * form, gate-verified. */
  def termDocCounts(docs: Dataset[AnnotatedDoc]): DataFrame =
    termOccurrences(docs)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("cnt"))

  // The reference's `counts` FILE layout (term → per-doc count array,
  // TermCounter.java:141-154 merged by IceCLI.java:592-611) is carried
  // relationally by `termDocCounts` above: a per-term array column
  // would put a stopword's entire posting list in one row (unbounded
  // per-key collect_list), so the flat (term, doc_id, cnt) table IS
  // the scale-safe representation of that file.

  /** Ratio ranking (A9, TermRanker.java:84-88 with alpha=1 and +1
    * smoothing): score = fgDocFreq * ln(fgDocFreq) / (bgDocFreq + 1).
    * J1 dimension join on `term`; score rounded to 6 dp for
    * cross-engine comparability.
    *
    * Scale note: NO broadcast hint on the bg side — the background
    * TERM VOCABULARY is unbounded at web scale, so the join is left to
    * AQE, which still broadcasts a small side at runtime and falls back
    * to a shuffled hash join on `term` (the natural key) when the
    * vocabulary outgrows an executor. */
  def rankTerms(fg: DataFrame, bg: DataFrame): DataFrame = {
    val bgc = bg.select(col("term").as("bg_term"),
      col("doc_freq").as("bg_doc_freq"))
    fg.join(bgc, col("term") === col("bg_term"), "left")
      .withColumn("score",
        graft.functions.Quantize.q6(
          col("doc_freq") * log(col("doc_freq").cast("double")) /
            (coalesce(col("bg_doc_freq"), lit(0L)) + lit(1))))
      .select(col("term"), col("doc_freq"), col("total_freq"), col("score"))
  }
}
