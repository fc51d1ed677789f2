package graft

import graft.datapipe._
import graft.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-side implementations of the training-data-pipeline and
  * general relational coverage queries (the non-KG half of the driver
  * contract). Decimal-cast sums keep double aggregation exact and
  * order-independent so results hash-match the DuckDB oracle. */
object DataQueries {

  /** Deterministic corpus slice for the radius-15 simhash parity row
    * (`dedup_simhash`): both the Spark query and its DuckDB oracle
    * filter `doc_id < simhashParityCap`, so the complete-recall audit
    * runs on an identical bounded prefix on both engines. One constant,
    * one definition — the two sides cannot drift. */
  private[graft] val simhashParityCap = 2048L

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  private def ev(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** Stage events.parquet into a fresh temp directory for a file-stream
    * read (readStream needs a directory containing only the streamed
    * table). A single-file parquet is copied as-is; a directory-style
    * parquet has its CHILDREN copied into the temp root — part files
    * land as direct children (readStream lists only those; a nested
    * `tempdir/events.parquet/part-*` layout would stream zero rows)
    * while `col=value` partition subdirectories keep their names and
    * relative structure, so partition-column discovery still works.
    * Everything registers deleteOnExit so repeated Bench/Verify runs
    * don't accumulate copies in /tmp — and the staged copy is CACHED
    * per (source dir, prefix) for the JVM's lifetime: the input is
    * read-only for the stream, so a 3-rep bench must not hold six
    * simultaneous full copies of events.parquet on /tmp (at a larger
    * scale factor those copies, not the queries, would exhaust the
    * disk mid-run). */
  private val stagedInputs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.nio.file.Path]()
  private[graft] def stageStreamInput(d: String, prefix: String): java.nio.file.Path =
    stagedInputs.computeIfAbsent((d, prefix),
      (k: (String, String)) => doStage(k._1, k._2))
  private def doStage(d: String, prefix: String): java.nio.file.Path = {
    import java.nio.file.{Files, Path, Paths}
    val src = Paths.get(s"$d/events.parquet")
    val dir = Files.createTempDirectory(prefix)
    dir.toFile.deleteOnExit()
    def copyTree(from: Path, to: Path): Unit = {
      if (Files.isDirectory(from)) {
        Files.createDirectories(to)
        to.toFile.deleteOnExit()
        val stream = Files.list(from)
        try {
          val it = stream.iterator()
          while (it.hasNext) {
            val c = it.next()
            val name = c.getFileName.toString
            if (!name.startsWith("_") && !name.startsWith("."))
              copyTree(c, to.resolve(name))
          }
        } finally stream.close()
      } else {
        Files.copy(from, to)
        to.toFile.deleteOnExit()
      }
    }
    if (Files.isDirectory(src)) {
      val stream = Files.list(src)
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val c = it.next()
          val name = c.getFileName.toString
          if (!name.startsWith("_") && !name.startsWith("."))
            copyTree(c, dir.resolve(name))
        }
      } finally stream.close()
    } else copyTree(src, dir.resolve("events.parquet"))
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- dedup family ---
    "dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    // n-gram Jaccard dedup SHIPS through the banded-LSH path at its 0.7
    // threshold (32×3 bands miss a j=0.7 pair with prob ~1.4e-6;
    // candidates are exact-Jaccard verified, so precision is 1). The
    // brute Dedup.ngramJaccard shingle self-join is demoted to
    // verification-oracle duty (tests + the DuckDB gate), where its
    // O(all-pairs) cost never touches a production corpus.
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.minhashLsh(docs(s, d), threshold = 0.7)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLsh(docs(s, d))),
    // ORACLE-PARITY CONFIG, pinned explicitly: radius 15 (16×4-bit
    // bands) is the only radius at which simhash blocking reaches every
    // Jaccard-0.8 fixture pair, so the independent Jaccard oracle
    // doubles as a complete blocking-recall check. The operator's
    // shipped default is the classic scalable radius 3 (4×16-bit bands,
    // 65k bucket values — see Dedup.bandScheme); high-radius Jaccard
    // dedup at 100 TB belongs to minhashLsh above. The row runs over a
    // BOUNDED deterministic corpus slice (doc_id < simhashParityCap,
    // identical predicate in the oracle): at radius 15 in-bucket pairs
    // grow ~n²/16, and the unbounded row alone cost 330 s of the 486 s
    // sf1.0 sweep — a constant-size prefix keeps the complete-recall
    // semantics (every planted near-dup pair (i-5, i), i%20==5, has
    // both endpoints inside any prefix ≥ 25 docs) while the row's cost
    // stays FLAT as the corpus scales. The full-corpus configs remain
    // gated by dedup_minhash / dedup_ngram_jaccard / dedup_simhash_r3.
    "dedup_simhash" -> ((s, d) => Dedup.simhashNearDup(
      docs(s, d).filter(col("doc_id") < simhashParityCap), maxDist = 15)),
    // SHIPPED-CONFIG gate: the default radius 3 (4×16-bit bands — the
    // config users actually get) run end-to-end, with the MD5-derived
    // oracle-parity feature hash so the DuckDB oracle RE-DERIVES the
    // hamming<=3 filter from raw text (per-doc signature recomputed in
    // SQL) instead of assuming complete blocking recall like the
    // radius-15 row above. Banding geometry, blocked join, codegen
    // distance filter and candidate-only verify are the shipped code
    // path; only the 64-bit feature-hash constant differs.
    "dedup_simhash_r3" -> ((s, d) =>
      Dedup.simhashNearDup(docs(s, d), maxDist = 3, parityHash = true)),
    // near-dup cluster canonicalization: connected components over the
    // LSH-verified near-dup pairs, representative = min doc in the
    // cluster — the "keep one survivor per dup cluster" op of a
    // training-data pipeline, on the same CC engine as entity
    // canonicalization
    "dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minhashLsh(docs(s, d))
        .select(col("ida").as("src"), col("idb").as("dst"))
      graft.operators.Canonicalize.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("comp").as("rep_id"))
    }),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDupLsh(emb(s, d))),
    // --- similarity search ---
    // EXACT BASELINE, not a scale path: brute-force top-k scans the
    // whole corpus per query — it exists as the ground truth the
    // ann_lsh/ann_ivf recall gates are scored against (and as the small
    // query-set exact surface). Production ANN at 100 TB is ann_lsh /
    // ann_ivf below, whose bucketed joins are plan-asserted in PlanSpec.
    "ann_topk" -> ((s, d) => Ann.bruteForceTopK(emb(s, d))),
    "ann_lsh" -> ((s, d) => Ann.lshRecallGate(emb(s, d))),
    "ann_ivf" -> ((s, d) => Ann.ivfRecallGate(emb(s, d))),
    // --- text analysis ---
    "text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(docs(s, d))),
    "text_tokens_bpe" -> ((s, d) => TextAnalysis.tokenCountsRegex(docs(s, d))),
    "text_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d))),
    "text_quality" -> ((s, d) => TextAnalysis.qualityScore(docs(s, d))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d))),
    "text_trainset" -> ((s, d) => TextAnalysis.trainset(docs(s, d))),
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionRatio(docs(s, d))),
    "text_redact" -> ((s, d) => {
      // deterministic PII augmentation (the fixture role Gen plays for
      // the KG queries): both engines construct identical PII-bearing
      // text from (doc_id, text), so the oracle hash-verifies REAL
      // redactions, not a no-op pass over clean text
      val aug = docs(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" Contact u"), col("doc_id"),
              lit("@mail.example.com or 555-867-5309."))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" Server 192.168.1.42 logged.")).otherwise(lit("")))
          .as("text"))
      TextAnalysis.redactPii(aug)
    }),
    "text_contamination" -> ((s, d) => {
      // benchmark slice = doc_id % 20 == 7 (the "eval set"); the corpus
      // under test is everything else
      val all = docs(s, d)
      TextAnalysis.contamination(all.filter(col("doc_id") % 20 =!= 7),
        all.filter(col("doc_id") % 20 === 7))
    }),
    "text_mix" -> ((s, d) => TextAnalysis.mixtureSample(docs(s, d))),
    "text_pack" -> ((s, d) => TextAnalysis.packSequences(docs(s, d))),
    // --- multimodal plumbing ---
    "kg_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.assets(KgPipeline.corpus(s, d))).toDF()),
    // --- relational coverage (joins / windows / set ops / json / time) ---
    "q_join_agg" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      val n = s.read.parquet(s"$d/nation.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)") *
              (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    "q_window_topk" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),
    "q_anti_join" -> ((s, d) => {
      val c = s.read.parquet(s"$d/customer.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q_semi_join" -> ((s, d) => {
      val c = s.read.parquet(s"$d/customer.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"))
    }),
    "q_events_hourly" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"),
          floor(col("ts").cast("timestamp").cast("long") / 3600).as("hour_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))),
    "q_salted_events" -> ((s, d) => {
      // salt from event_id (the stream's unique key): deterministic
      // under stage retry, spreads hot event_type keys
      val df = ev(s, d).select(col("event_type"), col("event_id"),
        col("value").cast("decimal(18,4)").as("v"))
      graft.functions.Salting.saltedSum(df, Seq("event_type"), "v", "total",
          uniqueKeys = Seq("event_id"))
        .select(col("event_type"), col("total").cast("double").as("total"))
    }),
    "q_distinct_users" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))),
    "q_stream_hourly" -> ((s, d) => {
      // watermarked APPEND-mode windowed aggregation (the third
      // streaming surface: complete-mode agg = q_stream_events,
      // flatMapGroupsWithState = q_stream_sessions, watermark-evicted
      // window state = this). A window emits once the final watermark
      // (max ts - 10 min) passes its END — boundary INCLUSIVE
      // (window.end <= wm), pinned by StreamingWindowSpec, and the
      // DuckDB oracle applies the identical predicate.
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val dir = stageStreamInput(d, "graft-qhourly")
      // window state on RocksDB (heap-bounded at web-scale keyspaces)
      graft.streaming.StateStores.useRocksDb(s)
      val name = "qsh_" + java.lang.Long.toHexString(System.nanoTime())
      val q = graft.streaming.IncrementalIngest.windowedEventCounts(
          s.readStream.schema(schema).parquet(dir.toString))
        .select(col("window.start").cast("long").as("win_start_s"),
          col("event_type"), col("n"))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "q_stream_hourly: stream did not terminate within 300s")
      s.table(name)
    }),
    "q_events_json" -> ((s, d) =>
      ev(s, d).select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))),
    "q_part_supplier" -> ((s, d) => {
      // 3-dim broadcast chain over the remaining star-schema tables
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val p = s.read.parquet(s"$d/part.parquet")
      val su = s.read.parquet(s"$d/supplier.parquet")
      val n = s.read.parquet(s"$d/nation.parquet")
      val r = s.read.parquet(s"$d/region.parquet")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("p_brand"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"),
          countDistinct(col("s_suppkey")).as("n_suppliers"))
    }),
    "q_stream_events" -> ((s, d) => {
      // Structured Streaming surface inside the correctness gate: drain
      // the events table through a file stream (Trigger.AvailableNow)
      // into a complete-mode memory sink; result must equal the batch
      // aggregation (the DuckDB oracle).
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val dir = stageStreamInput(d, "graft-qstream")
      // aggregation state on RocksDB (see StateStores)
      graft.streaming.StateStores.useRocksDb(s)
      val name = "qse_" + java.lang.Long.toHexString(System.nanoTime())
      val q = s.readStream.schema(schema).parquet(dir.toString)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      // fail fast on timeout: a silently partial memory sink would
      // otherwise surface as an opaque oracle row-count mismatch
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "q_stream_events: stream did not terminate within 300s")
      s.table(name)
    }),
    "q_stream_sessions" -> ((s, d) => {
      // stateful streaming surface inside the correctness gate:
      // flatMapGroupsWithState sessionization (30-min gap, 10-min
      // watermark) over a file stream drained with AvailableNow. The
      // DuckDB oracle recomputes the same semantics relationally:
      // gap-split sessions, where a session emits iff the final
      // watermark (max ts - 10 min) passed its end + gap — the
      // watermark-finalization rule, uniform over every session (a
      // pending session is amendable by admissible late events until
      // then, so emitting on gap-close alone would be premature).
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val dir = stageStreamInput(d, "graft-qsess")
      // per-user session state on RocksDB: the pending-session map is
      // the unbounded-keyspace state of this library (see StateStores)
      graft.streaming.StateStores.useRocksDb(s)
      val name = "qss_" + java.lang.Long.toHexString(System.nanoTime())
      val stream = s.readStream.schema(schema).parquet(dir.toString)
      val q = graft.streaming.Sessionize.sessions(stream)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "q_stream_sessions: stream did not terminate within 300s")
      s.table(name)
    }),
    "q_union_agg" -> ((s, d) => {
      // union + re-aggregate (the reference's split/merge shape, A4/A5)
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val a = li.filter(col("l_linenumber") % 2 === 0)
      val b = li.filter(col("l_linenumber") % 2 =!= 0)
      a.unionByName(b).groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
    }),
  )

  val oracles: Map[String, String] = {
    // gram index range derived from the LONGEST document, not a
    // hardcoded cap: a future fixture with longer docs must lengthen the
    // oracle's shingle enumeration, not silently truncate it
    val maxLen =
      """(SELECT coalesce(max(len(string_split_regex(trim(text), '\s+'))), 1)
        |          FROM documents)""".stripMargin
    // `where` scopes the shingle space to a corpus slice (must match
    // the Spark side's filter exactly — see simhashParityCap)
    def shingleCteWhere(where: String) =
      s"""WITH idx(i) AS (SELECT unnest(generate_series(1, $maxLen)) ),
        |w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
        |      FROM documents$where),
        |s AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
        |      FROM w CROSS JOIN idx WHERE i <= len(ws)-2),
        |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
        |          FROM s a JOIN s b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)""".stripMargin
    val shingleCte = shingleCteWhere("")
    def jaccardSqlWhere(threshold: Double, where: String) =
      s"""${shingleCteWhere(where)}
         |SELECT p.ida, p.idb, p.shared * 1.0 / (x.n + y.n - p.shared) AS jaccard
         |FROM pairs p JOIN sz x ON p.ida = x.doc_id JOIN sz y ON p.idb = y.doc_id
         |WHERE p.shared * 1.0 / (x.n + y.n - p.shared) >= $threshold""".stripMargin
    def jaccardSql(threshold: Double) = jaccardSqlWhere(threshold, "")
    val embCte =
      """WITH u AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings
        |),
        |norms AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM u GROUP BY 1)""".stripMargin
    val langIdSql =
      """WITH h AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> x IN ('the','a','of','and','is'))) AS en,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> x IN ('der','die','das','und','ist'))) AS de,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> x IN ('le','la','les','et','est'))) AS fr,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> x IN ('el','los','las','y','es'))) AS es
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN greatest(en,de,fr,es) = 0 THEN 'unk'
        |       WHEN en = greatest(en,de,fr,es) THEN 'en'
        |       WHEN de = greatest(en,de,fr,es) THEN 'de'
        |       WHEN fr = greatest(en,de,fr,es) THEN 'fr'
        |       ELSE 'es' END AS pred_lang
        |FROM h""".stripMargin
    // quantized as floor(x*1e6 + 0.5)/1e6, NOT round(): identical float
    // ops to the Spark side, so 5e-7-boundary scores cannot flip between
    // the engines' differing round()-tie semantics (see qualityCol)
    val qualitySql =
      """SELECT doc_id, floor((
        |  least(len(string_split_regex(trim(text), '\s+')), 50) / 50.0 * 0.5 +
        |  (length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 /
        |   greatest(length(text), 1)) * 0.3 +
        |  (1.0 - len(list_filter(string_split_regex(lower(text), '\s+'),
        |     x -> x IN ('the','a','an','of','and','or','is','to','in','on'))) * 1.0 /
        |   greatest(len(string_split_regex(trim(text), '\s+')), 1)) * 0.2
        |  ) * 1000000.0 + 0.5) / 1000000.0 AS quality
        |FROM documents""".stripMargin
    Map(
      "text_trainset" ->
        s"""WITH q AS ($qualitySql), l AS ($langIdSql),
           |s AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
           |SELECT q.doc_id, q.quality, l.pred_lang
           |FROM q JOIN l ON q.doc_id = l.doc_id
           |       JOIN s ON q.doc_id = s.doc_id
           |WHERE q.quality >= 0.5 AND l.pred_lang = 'en'""".stripMargin,
      "dedup_exact" ->
        "SELECT md5(text) AS fp, count(*) AS cnt, min(doc_id) AS keep_id FROM documents GROUP BY 1",
      "dedup_ngram_jaccard" -> jaccardSql(0.7),
      // oracle valid because LSH recall at j>=0.8 with 32x3 bands is ~1-1e-10
      "dedup_minhash" -> jaccardSql(0.8),
      // transitive closure over the near-dup pairs via recursive CTE;
      // component representative = min reachable doc (incl. self)
      "dedup_clusters" ->
        s"""WITH RECURSIVE p0 AS (${jaccardSql(0.8)}),
           |e AS (SELECT ida AS src, idb AS dst FROM p0
           |      UNION SELECT idb, ida FROM p0),
           |reach(src, dst) AS (
           |  SELECT src, dst FROM e
           |  UNION
           |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
           |),
           |allr AS (SELECT src, dst FROM reach
           |         UNION SELECT src, src FROM e)
           |SELECT src AS doc_id, min(dst) AS rep_id FROM allr GROUP BY 1""".stripMargin,
      "dedup_embedding" ->
        s"""$embCte,
           |dots AS (
           |  SELECT a.vec_id AS ida, b.vec_id AS idb, sum(a.v * b.v) AS dot
           |  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
           |  GROUP BY 1, 2)
           |SELECT d.ida, d.idb
           |FROM dots d JOIN norms x ON d.ida = x.vec_id JOIN norms y ON d.idb = y.vec_id
           |WHERE d.dot / (x.nrm * y.nrm) >= 0.5""".stripMargin,
      "ann_topk" ->
        s"""$embCte,
           |dots AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         sum(q.v * c.v) AS dot
           |  FROM u q JOIN u c ON q.i = c.i AND q.vec_id < 10 AND q.vec_id <> c.vec_id
           |  GROUP BY 1, 2),
           |scored AS (
           |  SELECT d.query_id, d.neighbor_id,
           |         d.dot / (x.nrm * y.nrm) AS cos
           |  FROM dots d JOIN norms x ON d.query_id = x.vec_id
           |              JOIN norms y ON d.neighbor_id = y.vec_id),
           |ranked AS (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY cos DESC, neighbor_id) AS rank
           |  FROM scored)
           |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
           |FROM ranked WHERE rank <= 5""".stripMargin,
      "text_tokens" ->
        """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens,
          |       length(text) AS n_chars FROM documents""".stripMargin,
      "text_langid" -> langIdSql,
      "text_quality" -> qualitySql,
      "text_fingerprint" ->
        """SELECT doc_id,
          |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          |FROM documents""".stripMargin,
      "text_repetition" ->
        s"""WITH idx(i) AS (SELECT unnest(generate_series(1, $maxLen))),
          |w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          |      FROM documents),
          |g AS (SELECT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2] AS gram
          |      FROM w CROSS JOIN idx WHERE i <= len(ws) - 2),
          |r AS (SELECT doc_id, count(*) AS total, count(DISTINCT gram) AS dist
          |      FROM g GROUP BY 1)
          |SELECT w.doc_id,
          |  CASE WHEN len(w.ws) >= 3
          |       THEN floor((r.total - r.dist) * 1.0 / r.total * 1e6 + 0.5)
          |            / 1e6
          |       ELSE 0.0 END AS rep_ratio
          |FROM w LEFT JOIN r ON w.doc_id = r.doc_id""".stripMargin,
      "text_redact" ->
        """WITH aug AS (SELECT doc_id, text ||
          |  CASE WHEN doc_id % 5 = 0
          |       THEN ' Contact u' || doc_id || '@mail.example.com or 555-867-5309.'
          |       ELSE '' END ||
          |  CASE WHEN doc_id % 7 = 0
          |       THEN ' Server 192.168.1.42 logged.' ELSE '' END AS text
          |FROM documents)
          |SELECT doc_id,
          |  regexp_replace(regexp_replace(regexp_replace(text,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
          |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted,
          |  len(regexp_extract_all(text,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}|\b\d{3}-\d{3}-\d{4}\b|\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_pii
          |FROM aug""".stripMargin,
      "text_contamination" ->
        s"""WITH idx(i) AS (SELECT unnest(generate_series(1, $maxLen))),
          |w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          |      FROM documents),
          |s AS (SELECT DISTINCT doc_id,
          |        ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||
          |        ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS gram
          |      FROM w CROSS JOIN idx WHERE i <= len(ws) - 7)
          |SELECT a.doc_id, min(b.doc_id) AS bench_id
          |FROM s a JOIN s b ON a.gram = b.gram
          |WHERE b.doc_id % 20 = 7 AND a.doc_id % 20 <> 7
          |GROUP BY 1""".stripMargin,
      "kg_media_features" ->
        s"""${OracleSql.baseCte},
           |m AS (
           |  SELECT CAST(id AS VARCHAR) AS doc_id,
           |         'm-' || id || '-' || s AS media_ref
           |  FROM bb WHERE (id + s) % 4 = 0),
           |mm AS (SELECT doc_id, media_ref,
           |              3 * length(media_ref) AS n_bytes FROM m)
           |SELECT doc_id, media_ref, n_bytes,
           |       CAST(16 * (1 + n_bytes % 40) AS INT) AS width,
           |       CAST(16 * (1 + (n_bytes * 3) % 30) AS INT) AS height,
           |       'img' AS format
           |FROM mm""".stripMargin,
      "q_join_agg" ->
        """SELECT n_name,
          |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
          |        AS DOUBLE), 2) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY 1""".stripMargin,
      "q_window_topk" ->
        """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         row_number() OVER (PARTITION BY o_custkey
          |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3""".stripMargin,
      "q_anti_join" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
      "q_semi_join" ->
        """SELECT c_custkey FROM customer
          |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin,
      "q_events_hourly" ->
        """SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
          |  count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM events GROUP BY 1, 2""".stripMargin,
      "q_salted_events" ->
        """SELECT event_type,
          |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM events GROUP BY 1""".stripMargin,
      "q_distinct_users" ->
        "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1",
      "q_events_json" ->
        """SELECT event_type,
          |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
          |       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
          |FROM events GROUP BY 1""".stripMargin,
      "text_tokens_bpe" ->
        """SELECT doc_id,
          |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
          |FROM documents""".stripMargin,
      // sampling hash = md5_number_lower % 2^32 (same digest window the
      // simhash parity hash uses); thresholds spliced from the SAME
      // Scala constants the Spark sampler compares against, so a
      // boundary doc can never flip between the engines
      "text_mix" ->
        s"""WITH l AS ($langIdSql)
           |SELECT doc_id, pred_lang FROM l
           |WHERE md5_number_lower('smp:' || CAST(doc_id AS VARCHAR)) % 4294967296 <
           |  CASE pred_lang ${TextAnalysis.mixThresholds
                 .map { case (lg, t) => s"WHEN '$lg' THEN $t" }
                 .mkString(" ")} ELSE 0 END""".stripMargin,
      // identical integer arithmetic: running token sums per shard,
      // bucket = the sequence containing the doc's starting offset
      "text_pack" ->
        s"""WITH t AS (SELECT doc_id,
           |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           |    doc_id % ${TextAnalysis.packShards} AS shard FROM documents),
           |s AS (SELECT doc_id, shard, n_tokens,
           |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
           |         - n_tokens AS BIGINT) AS start_tok FROM t)
           |SELECT doc_id, shard, n_tokens,
           |  CAST(shard * ${TextAnalysis.packSeqStride} + start_tok // ${TextAnalysis.packBudget}
           |       AS BIGINT) AS seq_id
           |FROM s""".stripMargin,
      "q_part_supplier" ->
        """SELECT r_name, p_brand,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
          |  count(DISTINCT s_suppkey) AS n_suppliers
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2""".stripMargin,
      "q_stream_events" ->
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1",
      // boundary: window.end <= wm emits (StreamingWindowSpec pins the
      // equality case), so the oracle predicate is <= too
      "q_stream_hourly" ->
        """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS t
          |           FROM events),
          |wm AS (SELECT max(t) - INTERVAL 10 MINUTE AS w FROM e),
          |b AS (SELECT event_type,
          |             time_bucket(INTERVAL 1 HOUR, t) AS ws FROM e)
          |SELECT CAST(epoch(ws) AS BIGINT) AS win_start_s, event_type,
          |       count(*) AS n
          |FROM b, wm WHERE ws + INTERVAL 1 HOUR <= wm.w
          |GROUP BY 1, 2""".stripMargin,
      "q_stream_sessions" ->
        """WITH e AS (SELECT user_id,
          |            epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
          |wm AS (SELECT max(ms) - 600000 AS w FROM e),
          |o AS (SELECT user_id, ms,
          |        CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
          |                  > 1800000 THEN 1 ELSE 0 END AS brk FROM e),
          |g AS (SELECT user_id, ms,
          |        sum(brk) OVER (PARTITION BY user_id ORDER BY ms
          |                       ROWS UNBOUNDED PRECEDING) AS sid FROM o),
          |s AS (SELECT user_id, sid, min(ms) AS start_ms, max(ms) AS end_ms,
          |             count(*) AS n_events FROM g GROUP BY 1, 2)
          |SELECT s.user_id, s.start_ms, s.end_ms, s.n_events
          |FROM s, wm WHERE s.end_ms + 1800000 < wm.w""".stripMargin,
      "q_union_agg" ->
        """SELECT l_returnflag,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
          |FROM lineitem GROUP BY 1""".stripMargin,
      // dedup_simhash: simhash is the BLOCKING stage; the shipped output
      // is exact-Jaccard-verified candidates, so the oracle is the same
      // independent Jaccard recomputation as dedup_minhash. Blocking
      // recall < 1 would surface as a rows mismatch. The identical
      // doc_id prefix slice bounds the radius-15 row's n²/16 in-bucket
      // cost (see simhashParityCap at the Spark query).
      "dedup_simhash" ->
        jaccardSqlWhere(0.8, s" WHERE doc_id < $simhashParityCap"),
      // dedup_simhash_r3: fully independent recomputation — per-doc
      // 64-bit simhash signatures are re-derived in SQL over the same
      // distinct 3-gram features (md5_number_lower = the parity hash's
      // little-endian MD5 tail), bits compared positionally for the
      // Jaccard-verified pairs, and only pairs within hamming 3 kept.
      // Signatures are only built for docs appearing in some
      // Jaccard-0.8 pair, so the 64× bit expansion stays tiny.
      "dedup_simhash_r3" ->
        s"""$shingleCte,
           |jp AS (
           |  SELECT p.ida, p.idb,
           |         p.shared * 1.0 / (x.n + y.n - p.shared) AS jaccard
           |  FROM pairs p JOIN sz x ON p.ida = x.doc_id
           |               JOIN sz y ON p.idb = y.doc_id
           |  WHERE p.shared * 1.0 / (x.n + y.n - p.shared) >= 0.8),
           |ids AS (SELECT DISTINCT ida AS doc_id FROM jp
           |        UNION SELECT DISTINCT idb FROM jp),
           |bits AS (
           |  SELECT s.doc_id, t.i,
           |         CASE WHEN sum(CASE WHEN (md5_number_lower(s.gram) >> t.i)
           |                                 & 1::UBIGINT = 1
           |                           THEN 1 ELSE -1 END) > 0
           |              THEN 1 ELSE 0 END AS b
           |  FROM s JOIN ids USING (doc_id) CROSS JOIN range(64) t(i)
           |  GROUP BY 1, 2),
           |ham AS (SELECT jp.ida, jp.idb,
           |               sum(CASE WHEN x.b <> y.b THEN 1 ELSE 0 END) AS d
           |        FROM jp JOIN bits x ON x.doc_id = jp.ida
           |                JOIN bits y ON y.doc_id = jp.idb AND x.i = y.i
           |        GROUP BY 1, 2)
           |SELECT jp.ida, jp.idb, jp.jaccard
           |FROM jp JOIN ham ON jp.ida = ham.ida AND jp.idb = ham.idb
           |WHERE ham.d <= 3""".stripMargin,
      // ann_lsh / ann_ivf: per-query recall vs exact brute-force top-k,
      // reduced to a deterministic (query_id, recall_ok) table; the
      // oracle asserts recall_ok for every query in the query set.
      "ann_lsh" ->
        """SELECT DISTINCT vec_id AS query_id, true AS recall_ok
          |FROM embeddings WHERE vec_id < 10""".stripMargin,
      "ann_ivf" ->
        """SELECT DISTINCT vec_id AS query_id, true AS recall_ok
          |FROM embeddings WHERE vec_id < 10""".stripMargin,
    )
  }
}
