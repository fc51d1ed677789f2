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

  def langId(docs: DataFrame): DataFrame = {
    val ws = toks(lower(col("text")))
    def hits(lang: String): Column =
      size(filter(ws, w => markers(lang).map(m => w === m).reduce(_ || _)))
    val en = hits("en"); val de = hits("de"); val fr = hits("fr"); val es = hits("es")
    val best = greatest(en, de, fr, es)
    docs.select(col("doc_id"),
      when(best === 0, "unk")
        .when(en === best, "en")
        .when(de === best, "de")
        .when(fr === best, "fr")
        .otherwise("es").as("pred_lang"))
  }

  private val stopwordList = Seq("the", "a", "an", "of", "and", "or", "is",
    "to", "in", "on")

  /** Heuristic quality score in [0,1]: length, alphabetic ratio,
    * stopword ratio — rational arithmetic over ints so any engine
    * computes the identical double. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ws = toks(col("text"))
    val n = size(ws).cast("double")
    val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
      .cast("double") / greatest(length(col("text")), lit(1)).cast("double")
    val stops = size(filter(toks(lower(col("text"))),
      w => stopwordList.map(m => w === m).reduce(_ || _))).cast("double")
    docs.select(col("doc_id"),
      round(least(n, lit(50.0)) / 50.0 * 0.5 + alpha * 0.3 +
        (lit(1.0) - stops / greatest(n, lit(1.0))) * 0.2, 6).as("quality"))
  }

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
    * (min doc_id per content fingerprint). One narrow pass for the
    * scalar filters + one fingerprint groupBy; the semi-join on
    * survivors stays on the 16-byte fingerprint, never the text. */
  def trainset(docs: DataFrame, minQuality: Double = 0.5,
               lang: String = "en"): DataFrame = {
    val scored = docs
      .join(qualityScore(docs), "doc_id")
      .join(langId(docs), "doc_id")
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
