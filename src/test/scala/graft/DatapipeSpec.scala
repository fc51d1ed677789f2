package graft

import graft.datapipe._
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: approximate methods are held to
  * their exact brute-force baselines on the small scale factors. */
class DatapipeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("gramSet is the scalar twin of shingles (same set, same <n-words edge)") {
    // the map-side gram set powering minhash/simhash verification must
    // match the exploded shingle table gram-for-gram, including the
    // edge cases: <n words → no grams, repeated grams deduped, mixed
    // whitespace runs collapsed
    val edge = Seq(
      (1L, "a b c d e"), (2L, "x y"), (3L, ""), (4L, "  p\tq  r\ns  "),
      (5L, "t t t t t"), (6L, "one two three one two three one two"))
    val df = edge.toDF("doc_id", "text")
    val viaSpark = Dedup.shingles(df, 3).as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val viaScalar = edge.map { case (id, t) => id -> Dedup.gramSet(t, 3).toSet }
      .filter(_._2.nonEmpty).toMap
    assert(viaScalar === viaSpark)
    // and on the real fixture corpus
    val real = Dedup.shingles(docs, 3).as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val realScalar = texts.map { case (id, t) => id -> Dedup.gramSet(t, 3).toSet }
      .filter(_._2.nonEmpty).toMap
    assert(realScalar === real)
  }

  test("redactPii: typed placeholders and audit counts") {
    val df = Seq(
      (1L, "mail a.b-c@x.co.uk now"),
      (2L, "call 555-123-4567 or 555-999-0000"),
      (3L, "host 10.0.0.1 up"),
      (4L, "clean text"),
      (5L, "x@y.io at 1.2.3.4 call 111-222-3333")).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(df).as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(got(0) === ((1L, "mail [EMAIL] now", 1L)))
    assert(got(1) === ((2L, "call [PHONE] or [PHONE]", 2L)))
    assert(got(2) === ((3L, "host [IP] up", 1L)))
    assert(got(3) === ((4L, "clean text", 0L)))
    assert(got(4) === ((5L, "[EMAIL] at [IP] call [PHONE]", 3L)))
  }

  test("repetitionRatio: duplicate-gram fraction, short docs score 0") {
    val df = Seq(
      (1L, "a b c a b c a b"),   // grams: abc bca cab abc bca cab → 6 total, 3 distinct
      (2L, "a b c d e"),          // all distinct → 0.0
      (3L, "x y"),                // under 3 tokens → 0.0 (lazy branch)
      (4L, "t t t t")).toDF("doc_id", "text") // ttt ttt → 0.5
    val got = TextAnalysis.repetitionRatio(df).as[(Long, Double)]
      .collect().sortBy(_._1)
    assert(got === Array((1L, 0.5), (2L, 0.0), (3L, 0.0), (4L, 0.5)))
  }

  test("contamination: flags only docs sharing an 8-gram with the benchmark") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"), // shares "a b c d e f g h" with 100
      (2L, "z y x w v u t s r q"), // no shared 8-gram
      (3L, "short text")           // under 8 tokens, no grams
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a b c d e f g h k l"),
      (101L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(corpus, bench)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L)))
  }

  test("minhash signature: bounded, deterministic, union = elementwise min") {
    // pins the hash-family algebra: every value lies in [0, 2^31-1)
    // (the Mersenne modulus — also proves the a*x+b arithmetic never
    // overflowed into a negative), same grams → same signature, and the
    // defining minhash invariant sig(A ∪ B) = min(sig(A), sig(B))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val a = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong().toString)
      val b = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong().toString)
      val sa = Dedup.signature(a)
      val sb = Dedup.signature(b)
      assert(sa.toSeq === Dedup.signature(a).toSeq)
      assert(sa.forall(v => v >= 0L && v < 2147483647L))
      assert(Dedup.signature(a ++ b).toSeq ===
        sa.zip(sb).map(t => math.min(t._1, t._2)).toSeq)
    }
  }

  test("minhash LSH finds exactly the brute-force near-dup pairs (recall 1.0 here)") {
    val brute = Dedup.ngramJaccard(docs, threshold = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, threshold = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(lsh === brute)
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("simhash banding finds all pairs within hamming distance 3") {
    // brute force over all pairs via the same simhash signature
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => (id, Dedup.simhash(Dedup.simhashFeatures(t))) }
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    val banded = Dedup.simhashPairs(docs, maxDist = 3)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "exact duplicates must collide")
  }

  test("simhash near-dup (blocking + exact verify) equals brute n-gram Jaccard here") {
    // radius 15 = the oracle-parity config (fixture near-dups reach
    // hamming distance 14); the shipped default radius is 3
    val brute = Dedup.ngramJaccard(docs, threshold = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val sh = Dedup.simhashNearDup(docs, threshold = 0.8, maxDist = 15)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(sh === brute)
  }

  test("shipped simhash radius-3 output = (hamming<=3 pairs) verified at Jaccard 0.8") {
    // the scalable default config, checked against an in-test brute
    // recomputation: blocking must be pigeonhole-exact at radius 3 and
    // verification must keep exactly the true-Jaccard survivors
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => (id, Dedup.simhash(Dedup.simhashFeatures(t))) }
    val jac = Dedup.ngramJaccard(docs, threshold = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3 && jac((ida, idb))
    } yield (ida, idb)).toSet
    val shipped = Dedup.simhashNearDup(docs, threshold = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(shipped === expected)
  }

  test("parity hash matches DuckDB md5_number_lower (pinned values)") {
    // pinned against DuckDB 1.0.0: SELECT md5_number_lower(s) — the
    // little-endian int of MD5-digest bytes 8..15. If these drift, the
    // dedup_simhash_r3 oracle's SQL signature recomputation diverges.
    assert(Dedup.parityHash64("abc") === 8250560606382298838L)
    assert(Dedup.parityHash64("the quick brown") ===
      java.lang.Long.parseUnsignedLong("14284679354378825408"))
    assert(Dedup.parityHash64("") === 9098107892288553193L)
  }

  test("parity-hash simhash r3 = (hamming<=3 pairs under parity hash) at Jaccard 0.8") {
    // the dedup_simhash_r3 gate's exact semantics, brute-recomputed
    // in-test with the same parity hash
    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) =>
        (id, Dedup.simhash(Dedup.simhashFeatures(t), Dedup.parityHash64)) }
    val jac = Dedup.ngramJaccard(docs, threshold = 0.8)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3 && jac((ida, idb))
    } yield (ida, idb)).toSet
    val gated = Dedup.simhashNearDup(docs, threshold = 0.8, parityHash = true)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(gated === expected)
  }

  test("band scheme: fewest pigeonhole-exact bands per radius") {
    assert(Dedup.bandScheme(0) === ((1, 64)))
    assert(Dedup.bandScheme(3) === ((4, 16)))
    assert(Dedup.bandScheme(7) === ((8, 8)))
    assert(Dedup.bandScheme(15) === ((16, 4)))
    assert(Dedup.bandScheme(17) === ((32, 2)))
  }

  test("shipped ngram-Jaccard (banded at 0.7) equals the brute oracle here") {
    val brute = Dedup.ngramJaccard(docs, threshold = 0.7)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, threshold = 0.7)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(lsh === brute)
  }

  test("embedding LSH near-dup finds exactly the brute-force cosine pairs here") {
    val brute = Dedup.embeddingCosine(emb)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(emb)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(lsh === brute)
  }

  test("recall gates: every query passes at the shipped parameters") {
    val lshGate = Ann.lshRecallGate(emb, nQueries = 5)
      .as[(Long, Boolean)].collect().toMap
    assert(lshGate.size === 5 && lshGate.values.forall(identity))
    val ivfGate = Ann.ivfRecallGate(emb, nQueries = 5)
      .as[(Long, Boolean)].collect().toMap
    assert(ivfGate.size === 5 && ivfGate.values.forall(identity))
  }

  test("ann LSH neighbors within a query's bucket agree with brute force ranks") {
    // rank every corpus vector so each LSH neighbor has a true rank
    val brute = Ann.bruteForceTopK(emb, k = 1000, nQueries = 5)
      .as[(Long, Long, Int)].collect()
      .map { case (q, nb, r) => (q, nb) -> r }.toMap
    val lsh = Ann.lshTopK(emb, k = 5, nQueries = 5, bits = 4)
      .as[(Long, Long, Int)].collect()
    assert(lsh.nonEmpty)
    // within each query, LSH's local ranking must follow the true ranking
    lsh.groupBy(_._1).foreach { case (q, rows) =>
      val trueRanks = rows.sortBy(_._3).map(r => brute((q, r._2))).toSeq
      assert(trueRanks === trueRanks.sorted,
        s"query $q: LSH order disagrees with brute force")
    }
  }

  test("ann IVF: recall@5 vs brute force >= 0.6 with 4/16 probes; deterministic") {
    val brute = Ann.bruteForceTopK(emb, k = 5, nQueries = 5)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Ann.ivfTopK(emb, k = 5, nQueries = 5)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = brute.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty) intersect brute(q)).size / 5.0
    }
    assert(recall.sum / recall.size >= 0.6, s"mean recall ${recall.sum / 5}")
    // deterministic: same result on a second run
    val ivf2 = Ann.ivfTopK(emb, k = 5, nQueries = 5)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf === ivf2)
  }

  test("multimodal: media assets carry binary payloads; batched decode is deterministic") {
    val corpus = graft.pipeline.KgPipeline.corpus(spark, dir)
    val assets = Multimodal.assets(corpus)
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_bytes === 3L * f.media_ref.length)
      val (w, h, fmt) = Multimodal.decodeStub(Multimodal.payloadFor(f.media_ref))
      assert((f.width, f.height, f.format) === ((w, h, fmt)))
    }
  }

  test("rolling hash is order-sensitive and deterministic") {
    val a = TextAnalysis.rollingHash(Seq("a", "b", "c"))
    assert(a === TextAnalysis.rollingHash(Seq("a", "b", "c")))
    assert(a !== TextAnalysis.rollingHash(Seq("c", "b", "a")))
  }

  test("exact dedup keeps one representative per duplicate group") {
    val d = Dedup.exact(docs)
    assert(d.agg(sum("cnt")).first().getLong(0) === docs.count())
  }

  test("sampleU32 column expr equals the JVM parity hash's low 32 bits") {
    // the pure-column sampler (byte-swapped hex slice through conv)
    // must agree bit-for-bit with the scalar MD5 window parityHash64
    // reads — the same equivalence the DuckDB oracle's
    // md5_number_lower % 2^32 relies on
    val got = spark.range(0, 500)
      .select(col("id"), TextAnalysis.sampleU32(col("id")).as("u"))
      .as[(Long, Long)].collect().toMap
    (0L until 500L).foreach { id =>
      val expect = Dedup.parityHash64(s"smp:$id") & 0xffffffffL
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("mixtureSample: deterministic reruns, nested at lower rates") {
    val sampled = TextAnalysis.mixtureSample(docs)
      .as[(Long, String)].collect().toSet
    val again = TextAnalysis.mixtureSample(docs)
      .as[(Long, String)].collect().toSet
    assert(sampled === again) // no RNG anywhere: reruns identical
    assert(sampled.nonEmpty && sampled.size < docs.count())
    // halving every threshold must select a strict SUBSET (nested
    // samples): the keep decision is hash < threshold, monotone in the
    // threshold, so rate changes never reshuffle the sample
    val half = TextAnalysis.mixThresholds.map { case (l, t) => l -> t / 2 }
    val sub = TextAnalysis.mixtureSample(docs, half)
      .as[(Long, String)].collect().toSet
    assert(sub.subsetOf(sampled))
    assert(sub.size < sampled.size)
  }

  test("packSequences matches a single-threaded reference layout") {
    val rows = TextAnalysis.packSequences(docs)
      .select("doc_id", "shard", "n_tokens", "seq_id")
      .as[(Long, Long, Long, Long)].collect()
    // every doc packed exactly once
    assert(rows.map(_._1).distinct.length.toLong === docs.count())
    // within each shard: docs in id order, bucket = running-token-sum
    // offset / budget — recomputed serially here, independent of the
    // window implementation
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (id, sh, n, seq) =>
        assert(sh === id % TextAnalysis.packShards)
        assert(seq === sh * TextAnalysis.packSeqStride + cum / TextAnalysis.packBudget,
          s"doc $id in shard $shard")
        cum += n
      }
    }
  }

  test("mix/pack null-text semantics: engine-aligned, neighbors unharmed") {
    // Contract for dirty corpora (the real documents tables never
    // carry null text, so the gates can't pin this): mixtureSample
    // treats null text as 'unk' (sampled at the unk rate);
    // packSequences gives the null-text doc a null seq_id and lets it
    // contribute ZERO tokens to the running sum — what SQL aggregate
    // null-skipping does on the oracle side, so both engines lay out
    // the remaining docs identically. NOTE (round-5 ADVICE): only the
    // PACKING side is engine-aligned for nulls — the DuckDB langIdSql
    // oracle's CASE falls through to 'es' on null text where Spark's
    // langIdCol maps it to 'unk'; this test pins the Spark semantics
    // only, and the gates stay aligned because the fixtures carry no
    // null text.
    val dirty = Seq(
      (0L, "aaa bbb ccc"), (16L, null.asInstanceOf[String]),
      (32L, "ddd eee"), (48L, ""), (64L, "   "))
      .toDF("doc_id", "text")
    val mix = TextAnalysis.mixtureSample(
      dirty, Seq("unk" -> TextAnalysis.mixThreshold(1.0)))
      .as[(Long, String)].collect().toMap
    assert(mix.keySet === Set(0L, 16L, 32L, 48L, 64L)) // rate 1.0 keeps all
    assert(mix.values.toSet === Set("unk")) // no markers + null both 'unk'
    val packed = TextAnalysis.packSequences(dirty, shards = 1, budgetTokens = 4)
      .select("doc_id", "n_tokens", "seq_id")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(packed(16L) === ((None, None))) // null text → null count/seq
    // split('', '\s+') = [''] on both engines: empty/blank text counts 1
    assert(packed(0L) === ((Some(3L), Some(0L))))  // offsets 0..2
    assert(packed(32L) === ((Some(2L), Some(0L)))) // 3..4 (null added 0)
    assert(packed(48L) === ((Some(1L), Some(1L)))) // 5
    assert(packed(64L) === ((Some(1L), Some(1L)))) // 6
  }
}
