package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * language-ID (marker-word heuristic), quality scoring, document
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs) so they stay inside the parquet scan's projection at scale.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** (doc_id, n_tokens, n_chars). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"))

  /** Marker-word language ID. Deterministic tie order en>de>fr>es;
    * 'unk' when no marker hits. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Column form of the language-ID heuristic (composes into a single
    * narrow projection — `trainset` uses this to avoid joining the
    * corpus back to itself for a per-row scalar). */
  def langIdCol(text: Column): Column = {
    val ws = toks(lower(text))
    def hits(lang: String): Column =
      size(filter(ws, w => markers(lang).map(m => w === m).reduce(_ || _)))
    val en = hits("en"); val de = hits("de"); val fr = hits("fr"); val es = hits("es")
    val best = greatest(en, de, fr, es)
    when(best === 0, "unk")
      .when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .otherwise("es")
  }

  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langIdCol(col("text")).as("pred_lang"))

  private val stopwordList = Seq("the", "a", "an", "of", "and", "or", "is",
    "to", "in", "on")

  /** Heuristic quality score in [0,1]: length, alphabetic ratio,
    * stopword ratio — rational arithmetic over ints so any engine
    * computes the identical double. */
  /** Column form of the quality score (see [[langIdCol]] for why). */
  def qualityCol(text: Column): Column = {
    val n = size(toks(text)).cast("double")
    val alpha = length(regexp_replace(lower(text), "[^a-z]", ""))
      .cast("double") / greatest(length(text), lit(1)).cast("double")
    val stops = size(filter(toks(lower(text)),
      w => stopwordList.map(m => w === m).reduce(_ || _))).cast("double")
    round(least(n, lit(50.0)) / 50.0 * 0.5 + alpha * 0.3 +
      (lit(1.0) - stops / greatest(n, lit(1.0))) * 0.2, 6)
  }

  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityCol(col("text")).as("quality"))

  /** BPE-ish regex token count: alphabetic runs, digit runs, and single
    * non-space symbols each count as one token (the sub-word-tokenizer
    * approximation for training-data budgeting). Pure column
    * expression — stays codegen'd and pushdown-friendly. */
  def tokenCountsRegex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Whitespace/case-normalized 128-bit content fingerprint. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))

  /** Composite training-set selection — the end-to-end data-curation
    * shape: quality floor ∧ language filter ∧ exact-dedup survivor
    * (min doc_id per content fingerprint). The scalar scores are
    * computed IN the corpus projection (column forms above) — the
    * corpus is never joined back to itself for a per-row scalar — so
    * the whole operator is one narrow scored pass + one fingerprint
    * groupBy + one semi-join that carries only (doc_id). */
  def trainset(docs: DataFrame, minQuality: Double = 0.5,
               lang: String = "en"): DataFrame = {
    val scored = docs.select(col("doc_id"),
        qualityCol(col("text")).as("quality"),
        langIdCol(col("text")).as("pred_lang"))
      .filter(col("quality") >= minQuality && col("pred_lang") === lang)
    val survivors = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    scored.join(survivors, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("quality"), col("pred_lang"))
  }

  /** Rolling polynomial token hash (Rabin-Karp-style) — the streaming
    * fingerprint variant; exercised in unit tests (not SQL-expressible). */
  def rollingHash(tokens: Seq[String], base: Long = 1000003L): Long =
    tokens.foldLeft(0L)((acc, t) =>
      acc * base + (scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xffffffffL))
}
