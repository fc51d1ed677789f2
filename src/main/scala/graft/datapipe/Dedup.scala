package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design notes:
  *  - exact dedup groups by a 128-bit text fingerprint, not the text,
  *    so the shuffle carries 16 bytes/row instead of documents
  *  - n-gram Jaccard explodes shingles and self-joins on the shingle —
  *    correct but O(candidate pairs); it is the verification oracle
  *  - MinHash LSH is the scale path: 96 hashes → 32 bands × 3 rows,
  *    candidates = pairs sharing a band bucket, then exact-Jaccard
  *    verification of candidates only. Band buckets distribute the
  *    join; hot buckets are bounded by the band width.
  *  - SimHash covers hamming-distance near-dups over 3-gram features
  *    with 16×4-bit band blocking (pigeonhole-exact through distance 15)
  *    and exact-Jaccard verification of candidates only.
  */
object Dedup {

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word n-gram shingle SET of one document — the scalar
    * twin of [[shingles]] (same split / same <n-words → empty
    * semantics), used where the gram set can stay inside a narrow
    * map-side pass instead of being exploded and shuffled. */
  def gramSet(text: String, n: Int = 3): Seq[String] = {
    // null text → no grams (the column pipeline null-propagated; a
    // UDF caller must not NPE on a nullable text column)
    if (text == null) return Seq.empty
    val ws = text.trim.split("\\s+")
    if (ws.length < n) Seq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).distinct
  }

  /** Distinct word n-gram shingles per doc: (doc_id, gram). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = docs.select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
    w.select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("ws")) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("ws"), i + k + 1)): _*)))
        .as("gram"))
      .distinct()
  }

  /** Exact dedup: fingerprint → (count, representative doc). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))

  /** All pairs with n-gram Jaccard >= threshold (brute shingle join).
    *
    * VERIFICATION ORACLE ONLY — not a shipped operator: the full-corpus
    * distinct-shingle shuffle plus the gram self-join is O(candidate
    * pairs) over the whole corpus and does not survive 100×. Product
    * n-gram Jaccard dedup ships through [[minhashLsh]] (banded buckets,
    * candidates-only exact verify), which this function exists to
    * cross-check in tests and in the DuckDB gate oracles. */
  def ngramJaccard(docs: DataFrame, n: Int = 3,
                   threshold: Double = 0.7): DataFrame = {
    // persist: consumed three times (size marginals + both self-join
    // sides); Catalyst does NOT reuse the distinct's exchange across
    // consumers (fresh exprIds per subtree), so without this the scan +
    // explode + distinct shuffle runs once per consumer. Released by the
    // caller's clearCache.
    val s = shingles(docs, n).persist()
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = s.as("a").join(s.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("ida"), col("sz").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("sz").as("nb")), "idb")
      .withColumn("jaccard",
        col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  // --- MinHash LSH ---------------------------------------------------------

  val NumHashes = 96
  val Bands = 32 // 3 rows per band; detect prob at j=0.8 ≈ 1 - 1e-10
  // 2^31 - 1 (Mersenne). The modulus must be small enough that
  // a * (x % Prime) + b stays inside a signed 64-bit long:
  // (2^31-2)^2 + 2^31 < 2^62 — genuinely overflow-free, unlike a
  // 61-bit modulus whose a*x product would wrap at 2^63.
  private val Prime = 2147483647L
  private val hashParams: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)(((rnd.nextLong() & Long.MaxValue) % (Prime - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % Prime))
  }

  /** MinHash signature of a shingle set (deterministic, MurmurHash3 base). */
  def signature(grams: Iterable[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    grams.foreach { g =>
      val x = ((MurmurHash3.stringHash(g).toLong & 0xffffffffL) + 1) % Prime
      var i = 0
      while (i < NumHashes) {
        val (a, b) = hashParams(i)
        val v = (a * x + b) % Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Candidate pairs via band buckets, verified with exact Jaccard.
    * Returns the same schema as [[ngramJaccard]]; on any input where
    * the LSH recall holds (see DatapipeSpec) the results are equal. */
  def minhashLsh(docs: DataFrame, n: Int = 3,
                 threshold: Double = 0.8): DataFrame = {
    // The per-doc gram SET is computed map-side ([[gramSet]]) — the
    // full corpus shingle table is never exploded or shuffled (the old
    // shape paid a distinct-shuffle plus a collect_list shuffle over
    // every gram in the corpus before a single signature existed; at
    // 100 TB those two full-corpus shuffles dominate the operator).
    // ONE fused pass derives (signature, gram-set size) per doc — the
    // only two things the corpus-wide stages need — so the full-corpus
    // cache holds 97 longs/doc instead of every gram array (the old
    // docsG persist); grams are re-derived later ONLY for candidate
    // docs (the near-dup fraction), like simhashNearDup does.
    // Fan-out before the UDF: a single-file corpus scans as ONE task
    // and would run the whole narrow signature pass on one core (guide
    // §2.5); the shuffle moves raw doc rows once, before any derived
    // column exists. Persisted: feeds the band explode (twice, via the
    // self-join) and the size marginals; released by the caller's
    // clearCache, like every per-query cache here.
    val sigSzUdf = udf { (t: String) =>
      val g = gramSet(t, n)
      if (g.isEmpty) None else Some((signature(g), g.size.toLong))
    }
    val docsP = graft.functions.Fan.out(docs, col("doc_id"))
    val base = docsP.select(col("doc_id"), sigSzUdf(col("text")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s._1").as("sig"), col("s._2").as("sz"))
      .persist()
    val rows = NumHashes / Bands
    // band key = (band index, hash of the band's rows); the explode is
    // a cheap narrow op over the cached base, so it needs no cache of
    // its own
    val banded = base.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(Bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b)))
      .as(Seq("band", "bkey")))
    // persisted: consumed twice (the candidate-doc id list + the
    // verify join itself)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct().persist()
    // exact-verify candidates only: grams are computed and exploded
    // ONLY for docs that appear in some candidate pair — at scale that
    // is the near-dup fraction of the corpus, not the corpus
    val ids = cand.select(explode(array(col("ida"), col("idb"))).as("doc_id"))
      .distinct()
    val gramsUdf = udf((t: String) => gramSet(t, n))
    // join FIRST, fan the surviving candidate rows after: fanning the
    // raw corpus here would shuffle every document's text a second time
    // just to throw the non-candidates away behind the join (probe =
    // the raw scan — the joined frame's own probe would eagerly
    // execute the candidate subtree)
    val candG = graft.functions.Fan.outLike(
        docs.join(ids, "doc_id"), docs, col("doc_id"))
      .select(col("doc_id"), explode(gramsUdf(col("text"))).as("gram")).persist()
    val sizes = base.select(col("doc_id"), col("sz"))
    val shared = candG.select(col("doc_id").as("ida"), col("gram"))
      .join(cand, "ida")
      .join(candG.select(col("doc_id").as("idb"), col("gram")), Seq("idb", "gram"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("ida"), col("sz").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("sz").as("nb")), "idb")
      .withColumn("jaccard",
        col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  // --- SimHash -------------------------------------------------------------

  /** Default 64-bit feature hash: two murmur3 halves — the fast shipped
    * path (≈ ns/feature, stays cheap inside the per-doc signature loop). */
  val murmur64: String => Long = { t =>
    val h1 = MurmurHash3.stringHash(t, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(t, 0x5bd1e995)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** ORACLE-PARITY 64-bit feature hash: DuckDB's `md5_number_lower`
    * (little-endian int of MD5-digest bytes 8..15), so an independent
    * SQL oracle can recompute per-document simhash signatures from the
    * raw text. MD5 is ~10× slower than murmur per feature — this hash
    * exists for gate queries, not the shipped default (see
    * [[simhashNearDup]]'s `parityHash` flag). */
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue() =
      java.security.MessageDigest.getInstance("MD5")
  }
  val parityHash64: String => Long = { t =>
    // thread-local digest: getInstance is a JCA provider lookup +
    // allocation, too heavy for the hottest per-gram loop of the
    // signature UDF; digest() leaves the instance reset for reuse
    val d = md5Digest.get()
      .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }

  /** 64-bit SimHash over feature hashes. */
  def simhash(tokens: Iterable[String],
              hash64: String => Long = murmur64): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = hash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    acc.indices.foldLeft(0L)((v, i) => if (acc(i) > 0) v | (1L << i) else v)
  }

  /** Distinct word n-gram features for the simhash. Features match the
    * n-gram Jaccard truth space: unigram features cannot separate
    * template-heavy corpora where every document shares most WORDS but
    * few 3-grams (measured here: unigram simhash put 640k pairs within
    * distance 11 at sf0.1 vs 256 true near-dups; 3-gram simhash puts
    * ~the true pairs and nothing else there). */
  def simhashFeatures(text: String, n: Int = 3): Seq[String] = {
    // null text → no features (same contract as gramSet: a nullable
    // text column must not NPE the executor)
    if (text == null) return Seq.empty
    val ws = text.trim.split("\\s+")
    if (ws.length < n) ws.toSeq.distinct
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).distinct
  }

  /** Band scheme for exact pigeonhole blocking at `maxDist`: cut the
    * 64-bit signature into the FEWEST bands that still guarantee a pair
    * within `maxDist` flipped bits leaves at least one band untouched
    * (bands > maxDist, rounded up to a power of two dividing 64). Fewer
    * bands mean wider bucket keys, so the bucket population — the
    * n²-growth surface of the blocking join — shrinks exponentially as
    * the radius drops: maxDist 3 → 4 bands × 16 bits (65k bucket values,
    * the classic scalable config), maxDist 15 → 16 × 4 bits (16 values
    * per band — fixture/oracle-parity mode only, see [[simhashPairs]]). */
  def bandScheme(maxDist: Int): (Int, Int) = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of [0,64)")
    var bands = 1
    while (bands <= maxDist) bands *= 2
    (bands, 64 / bands)
  }

  /** Near-dup pairs with simhash hamming distance <= maxDist over
    * 3-gram features, blocked on the [[bandScheme]] bands for that
    * radius — by pigeonhole, a pair within `maxDist` must agree on at
    * least one band: blocking recall is exact at any configured radius.
    * The far-pair filter runs inside codegen BEFORE the distinct, so
    * band collisions that are not near-dups never reach a shuffle.
    *
    * Scale note: the SHIPPED default is the classic radius 3 with
    * 4 × 16-bit bands (65k bucket values — bucket population, and with
    * it the n²-in-bucket candidate growth, stays bounded at corpus
    * scale). Radius 15 (16 × 4-bit bands) remains available because the
    * fixture's Jaccard-0.8 true pairs reach distance 14 (measured) and
    * the independent Jaccard oracle can then verify blocking recall
    * end-to-end — but at that radius NO exact scheme has scalable
    * buckets (t-of-b block-concatenation keys a la Manku WWW'07 need
    * b >= dist + t, i.e. C(21,10)-ish key explosions), so high-radius
    * Jaccard dedup at 100 TB is [[minhashLsh]]'s job, whose banded
    * buckets DO scale. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   parityHash: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (bands, bits) = bandScheme(maxDist)
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val h64 = if (parityHash) parityHash64 else murmur64
    val sh = udf((t: String) => simhash(simhashFeatures(t), h64))
    // persist: the self-join consumes this subtree twice; without it the
    // parquet scan + simhash UDF run once per side (released by the
    // caller's clearCache, like every per-query cache here).
    // Fan-out first: the signature UDF is the hot narrow pass and a
    // single-file scan would run it on one task (guide §2.5).
    val sigs = graft.functions.Fan.out(docs, col("doc_id"))
      .select(col("doc_id"), sh(col("text")).as("sig")).persist()
    val banded = sigs.select(col("doc_id"), col("sig"), posexplode(
      array((0 until bands).map(b =>
        shiftright(col("sig"), b * bits).bitwiseAND(lit(mask))): _*))
      .as(Seq("band", "bkey")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        // native bit_count stays inside whole-stage codegen — this runs
        // once per band collision, the hottest row count in the operator
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("dist"))
      // filter BEFORE distinct: far pairs (the vast majority of band
      // collisions at 5-bit buckets) must not reach the dedup shuffle
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Simhash near-dup pairs, exact-verified: band blocking proposes
    * candidates within hamming distance `maxDist`, then each candidate
    * pair is verified with the exact n-gram Jaccard — same output
    * contract as [[ngramJaccard]], so the independent SQL oracle can
    * recompute the expected pairs. A blocking recall regression (a true
    * near-dup pair whose simhash drifts past `maxDist`) surfaces as a
    * row-count mismatch. The shipped default radius is 3 (the scalable
    * [[bandScheme]]); the `dedup_simhash` driver query pins radius 15
    * explicitly because only that radius reaches every Jaccard-0.8
    * fixture pair, making the independent Jaccard oracle a complete
    * recall check.
    *
    * `parityHash` swaps the murmur feature hash for the MD5-derived
    * [[parityHash64]] so a SQL oracle can re-derive the hamming filter
    * independently (the `dedup_simhash_r3` gate) — the banding geometry,
    * blocked join, codegen'd distance filter and candidate-only verify
    * are identical either way; only the 64-bit feature-hash constant
    * differs. Shipped default stays murmur (fast path). */
  def simhashNearDup(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                     maxDist: Int = 3, parityHash: Boolean = false): DataFrame = {
    // persisted: consumed twice (candidate-doc id list + verify join)
    val cand = simhashPairs(docs, maxDist, parityHash)
      .select(col("ida"), col("idb")).persist()
    // grams are computed and exploded ONLY for candidate docs: the id
    // join runs BELOW the gram UDF (Catalyst cannot push a join under a
    // UDF projection itself), so at scale the n-gram pass touches the
    // near-dup candidate fraction, not the corpus — unlike minhashLsh,
    // which needs every doc's signature, simhash's signatures come from
    // simhashPairs and the verify side can defer gram building entirely
    val ids = cand.select(explode(array(col("ida"), col("idb"))).as("doc_id"))
      .distinct()
    val gramsUdf = udf((t: String) => gramSet(t, n))
    // join FIRST (candidate ids into the scan), fan the surviving rows
    // after: the candidate fraction is what needs gram-building
    // parallelism, and fanning the raw corpus would shuffle every
    // document's text just to drop non-candidates behind the join
    // (probe = the raw scan, see Fan.outLike)
    val candG = graft.functions.Fan.outLike(
        docs.join(ids, "doc_id"), docs, col("doc_id"))
      .select(col("doc_id"), gramsUdf(col("text")).as("grams"))
      .filter(size(col("grams")) > 0).persist()
    val sizes = candG.select(col("doc_id"), size(col("grams")).cast("long").as("sz"))
    val ex = candG.select(col("doc_id"), explode(col("grams")).as("gram"))
    val shared = ex.select(col("doc_id").as("ida"), col("gram"))
      .join(cand, "ida")
      .join(ex.select(col("doc_id").as("idb"), col("gram")), Seq("idb", "gram"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("ida"), col("sz").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("sz").as("nb")), "idb")
      .withColumn("jaccard",
        col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  // --- embedding near-dup ----------------------------------------------------

  /** Embedding near-dup pairs via random-hyperplane LSH blocking
    * (driver query `dedup_embedding` — the scale path): each vector gets
    * `bands` bucket keys of `bits` sign bits; candidate pairs share at
    * least one (band, key) bucket; candidates are verified with the
    * exact codegen'd cosine. No side is ever collected or broadcast
    * whole — the self-join is distributed on the bucket key, and bucket
    * population is bounded by the band width. The brute
    * [[embeddingCosine]] remains the verification oracle. */
  def embeddingNearDupLsh(emb: DataFrame, threshold: Double = 0.5,
                          bits: Int = 4, bands: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    // empty corpus → empty pair set, not a first() crash; null vectors
    // must not be the dimension probe either
    val dimRow = emb.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).limit(1).collect()
    if (dimRow.isEmpty)
      return emb.select(col("vec_id").cast("long").as("ida"),
        col("vec_id").cast("long").as("idb")).limit(0)
    val dim = dimRow(0).getInt(0)
    val planes = spark.sparkContext.broadcast(
      Ann.hyperplanes(dim, bits * bands, seed = 11L))
    val keysUdf = udf((v: Seq[Double]) => {
      val ps = planes.value
      (0 until bands).map { b =>
        var key = 0
        var i = 0
        while (i < bits) {
          val p = ps(b * bits + i)
          var d = 0.0; var j = 0
          while (j < p.length && j < v.length) { d += v(j) * p(j); j += 1 }
          if (d >= 0) key |= (1 << i)
          i += 1
        }
        key
      }
    })
    // persist the shared subtrees (no ReuseExchange across consumers):
    // vecs feeds the band keys and both verify-join sides; banded feeds
    // both candidate-join sides — without the persist the hyperplane
    // projections run once per side. Fan-out first: a single-file
    // embedding table scans as one task and would serialize the
    // projection + cosine work onto one core (guide §2.5).
    val vecs = graft.functions.Fan.out(
        emb.filter(col("embedding").isNotNull), col("vec_id"))
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")).persist()
    val banded = vecs.select(col("vec_id"),
      posexplode(keysUdf(col("v"))).as(Seq("band", "bkey"))).persist()
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
      .distinct()
    cand
      .join(vecs.select(col("vec_id").as("ida"), col("v").as("va")), "ida")
      .join(vecs.select(col("vec_id").as("idb"), col("v").as("vb")), "idb")
      .filter(graft.plans.Functions.cosineSim(col("va"), col("vb")) >= threshold)
      .select(col("ida"), col("idb"))
  }

  /** Embedding near-dup pairs: cosine >= threshold over all pairs.
    * Brute-force baseline: one side is broadcast as a normalized
    * primitive matrix (the same memory contract as a broadcast-hash
    * join), the other stays distributed — each row scans the broadcast
    * side with a tight primitive-array dot product instead of a
    * nested-loop join over per-row array expressions. Valid while one
    * side fits in executor memory; at scale this is demoted to oracle
    * duty — the shipped `dedup_embedding` operator is
    * [[embeddingNearDupLsh]]. */
  def embeddingCosine(emb: DataFrame, threshold: Double = 0.5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))
      if (n == 0) v else v.map(_ / n)
    }
    val bc = spark.sparkContext.broadcast(
      vecs.collect().map { case (id, v) => (id, unit(v)) }.sortBy(_._1))
    vecs.flatMap { case (ida, va0) =>
      val va = unit(va0)
      val arr = bc.value
      arr.iterator.filter(_._1 > ida).flatMap { case (idb, vb) =>
        var s = 0.0
        var k = 0
        while (k < va.length) { s += va(k) * vb(k); k += 1 }
        if (s >= threshold) Some((ida, idb)) else None
      }
    }.toDF("ida", "idb")
  }
}
