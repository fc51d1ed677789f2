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
    // null text must be 'unk': without the explicit guard every `when`
    // condition is NULL (not true) and the null row falls through to
    // the 'es' catch-all
    when(text.isNull || best === 0, "unk")
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
  /** Column form of the quality score (see [[langIdCol]] for why).
    * Quantized engine-portably ([[graft.functions.Quantize]]) — this
    * was the site where the round()-tie divergence was first MEASURED
    * (5 of 50k scores at the sf1.0 sweep flipped between Spark and
    * DuckDB); every cross-engine score now quantizes the same way. */
  def qualityCol(text: Column): Column = {
    val n = size(toks(text)).cast("double")
    val alpha = length(regexp_replace(lower(text), "[^a-z]", ""))
      .cast("double") / greatest(length(text), lit(1)).cast("double")
    val stops = size(filter(toks(lower(text)),
      w => stopwordList.map(m => w === m).reduce(_ || _))).cast("double")
    val raw = least(n, lit(50.0)) / 50.0 * 0.5 + alpha * 0.3 +
      (lit(1.0) - stops / greatest(n, lit(1.0))) * 0.2
    graft.functions.Quantize.q6(raw)
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
    // (round 6: a Fan.out over the corpus was tried and reverted —
    // measured 0.72 s unfanned vs 1.12 s fanned in a same-JVM A/B; the
    // scoring projection is too cheap per row to buy back the shuffle)
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

  /** Repetition ratio — the repeated-n-gram quality filter of web-scale
    * curation pipelines: the fraction of a doc's word n-gram occurrences
    * that duplicate an earlier occurrence (0.0 = no repetition). Pure
    * column expressions over the per-doc gram array — no explode, no
    * shuffle, stays inside the scan's projection. The gram expression is
    * TOTAL: its index sequence is clamped (slice over greatest) so it
    * yields an empty array — never a negative element_at index — for
    * under-n-token docs, independent of CaseWhen branch laziness (an
    * optimizer that evaluated both branches, e.g. via cross-branch
    * subexpression elimination, must not turn the guard into a crash). */
  def repetitionRatio(docs: DataFrame, n: Int = 3): DataFrame = {
    val ws = toks(col("text"))
    // indices 0..size-n when size >= n, else [] (sequence always emits
    // at least one element, so the empty case comes from slice length 0)
    val idx = slice(sequence(lit(0), greatest(size(ws) - n, lit(0))),
      lit(1), greatest(size(ws) - n + 1, lit(0)))
    val grams = transform(idx,
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))
    val ratio = when(size(ws) >= n,
        graft.functions.Quantize.q6(
          (size(grams) - size(array_distinct(grams))).cast("double") /
            size(grams)))
      .otherwise(lit(0.0))
    docs.select(col("doc_id"), ratio.as("rep_ratio"))
  }

  // --- PII redaction -------------------------------------------------------

  /** PII patterns chosen to behave identically under Java regex (Spark)
    * and RE2 (DuckDB oracle): no backrefs, no lookaround, ASCII \b. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction — the scrubbing pass of a training-data pipeline:
    * emails/phone numbers/IPv4s replaced with typed placeholders, plus
    * the per-doc match count (the audit metric). Pure column
    * expressions, so the whole operator is one codegen'd projection
    * inside the scan — no UDF, no shuffle. Replacement order is safe:
    * no placeholder can create a new match for a later pattern. */
  def redactPii(docs: DataFrame): DataFrame = {
    val combined = s"$EmailRe|$PhoneRe|$Ipv4Re"
    docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
          EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"), Ipv4Re, "[IP]")
        .as("redacted"),
      size(regexp_extract_all(col("text"), lit(combined), lit(0)))
        .cast("long").as("n_pii"))
  }

  // --- benchmark-contamination detection -----------------------------------

  /** Word n-grams per doc, NOT deduped (unlike Dedup.shingles — the
    * consumer below aggregates per doc anyway, and a distinct here
    * would shuffle the full corpus gram table before the join). */
  private def grams(docs: DataFrame, n: Int): DataFrame = {
    val w = docs.select(col("doc_id"), toks(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
    w.select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("ws"), i + k + 1)): _*)))
      .as("gram"))
  }

  /** Benchmark-contamination detection — the decontamination pass of an
    * LLM training-data pipeline: corpus docs sharing at least one word
    * `n`-gram with a benchmark/eval document, reported with the lowest
    * matching benchmark id as evidence. Scale shape: the benchmark set
    * is tiny relative to the corpus, so its (distinct) gram table is
    * broadcast; the corpus side stays a narrow scan + explode feeding a
    * broadcast-hash join — the only shuffle is the per-doc min over the
    * matching rows (the contaminated fraction, not the corpus). */
  def contamination(corpus: DataFrame, bench: DataFrame, n: Int = 8): DataFrame =
    // corpus side fanned out before the gram explode + broadcast join:
    // a single-file corpus scans as one task and would run the whole
    // explode/join/partial-agg chain on one core (guide §2.5); no-op on
    // an already-parallel input. The bench side stays unfanned — it is
    // tiny, deduped and broadcast.
    grams(graft.functions.Fan.out(corpus, col("doc_id")), n)
      .join(broadcast(grams(bench, n).distinct()
        .select(col("gram"), col("doc_id").as("bench_id"))), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(min(col("bench_id")).as("bench_id"))

  // --- mixture sampling ------------------------------------------------------

  /** Integer sampling threshold for a keep-rate in [0,1]: a doc is kept
    * iff its 32-bit sampling hash is < floor(rate·2³²). Comparing
    * integers (never floats) keeps the decision bit-identical across
    * engines. */
  def mixThreshold(rate: Double): Long = (rate * 4294967296.0).toLong

  /** Per-language keep-rates of [[mixtureSample]] — the mixture-weighting
    * table of a training-data pipeline (downsample the high-resource
    * language, keep the rest). Stored as the exact integer thresholds
    * both engines compare against (the DuckDB oracle splices these same
    * constants, so the two sides can never disagree on a boundary doc). */
  val mixThresholds: Seq[(String, Long)] = Seq(
    "en" -> mixThreshold(0.5),
    "de" -> mixThreshold(0.9),
    "fr" -> mixThreshold(0.75),
    "es" -> mixThreshold(0.25),
    "unk" -> mixThreshold(0.05))

  /** Deterministic per-doc sampling hash: bytes 8..11 of
    * md5("smp:"++doc_id), little-endian — i.e. DuckDB's
    * `md5_number_lower(…) % 2³²` (the same digest window
    * [[graft.datapipe.Dedup.parityHash64]] uses), rebuilt here as a pure
    * column expression (byte-swapped hex slice through `conv`) so the
    * sampler stays inside whole-stage codegen with no UDF. Exact in a
    * LONG (< 2³²). */
  def sampleU32(docId: Column): Column = {
    val h = md5(concat(lit("smp:"), docId.cast("string")))
    conv(concat(substring(h, 23, 2), substring(h, 21, 2),
      substring(h, 19, 2), substring(h, 17, 2)), 16, 10).cast("long")
  }

  /** Deterministic stratified mixture sampling — the
    * dataset-reweighting op of a training-data pipeline: each doc is
    * kept iff hash(doc_id) falls under its language's threshold. One
    * narrow codegen'd projection + filter over the scan: no shuffle, no
    * state, no RNG (reruns and resumed runs select the identical
    * subset), so the operator scales embarrassingly. Because the hash
    * is a pure function of doc_id, lowering a rate selects a strict
    * subset of the higher rate's sample (nested samples — the property
    * tests pin this). */
  def mixtureSample(docs: DataFrame,
                    thresholds: Seq[(String, Long)] = mixThresholds): DataFrame = {
    val thr = thresholds.tail.foldLeft(
      when(col("pred_lang") === thresholds.head._1, lit(thresholds.head._2))) {
        case (acc, (lang, t)) => acc.when(col("pred_lang") === lang, lit(t))
      }.otherwise(lit(0L))
    // (round 6: a Fan.out was tried and reverted — 0.56 s unfanned vs
    // 0.69 s fanned in a same-JVM A/B; the zero-exchange plan stands)
    docs.select(col("doc_id"), langIdCol(col("text")).as("pred_lang"),
        sampleU32(col("doc_id")).as("u32"))
      .filter(col("u32") < thr)
      .select(col("doc_id"), col("pred_lang"))
  }

  // --- sequence packing ------------------------------------------------------

  /** Deterministic distributed sequence packing — the
    * fixed-token-budget batching op of a training-data pipeline: docs
    * are sharded by `doc_id % shards`, laid out in doc_id order within
    * each shard, and assigned to the sequence bucket containing their
    * starting token offset (first-fit-contiguous packing). The only
    * wide ops are one hash exchange on `shard` and the within-shard
    * sort — the unavoidable serialization of a packing order — and
    * they parallelize across shards, so `shards` is sized to the
    * cluster (16 here for local[32]; thousands on a real cluster). All
    * arithmetic is exact integers (token counts, running sums), so any
    * engine derives the identical layout. */
  /** Shipped packing geometry — shared with the DuckDB oracle SQL so the
    * two engines always pack against the same constants. */
  val packShards = 16
  val packBudget = 2048

  /** Per-shard id space: seq_id = shard * stride + bucket. 2⁴⁰ buckets
    * per shard keeps ids collision-free up to stride × budget ≈ 2⁵¹
    * tokens PER SHARD (a 1,000,000 stride would collide past ~2 G
    * tokens/shard — reachable on a 100-TB corpus even at thousands of
    * shards). shard ≤ ~16k × 2⁴⁰ still fits a BIGINT on both engines. */
  val packSeqStride = 1L << 40

  def packSequences(docs: DataFrame, shards: Int = packShards,
                    budgetTokens: Int = packBudget): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        (col("doc_id") % shards).cast("long").as("shard"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        // SQL `div` = exact integral division, matching the oracle's
        // `//` for ANY budget (floor(x/y) in doubles is only exact when
        // the budget is a power of two and the offset stays < 2⁵³)
        (col("shard") * packSeqStride +
          expr(s"start_tok div ${budgetTokens.toLong}L")).as("seq_id"))
  }
}
