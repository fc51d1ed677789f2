package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the
  *    (small) query set against the full corpus — the correctness
  *    baseline. Scales linearly in corpus size per query.
  *  - [[lshTopK]]: multi-band random-hyperplane LSH — candidates share
  *    at least one band bucket, ranked by exact cosine. The scale path:
  *    the bucket join distributes on (band, key); recall vs brute force
  *    is asserted in DatapipeSpec and in the driver gate
  *    ([[lshRecallGate]] / [[ivfRecallGate]]).
  */
object Ann {

  // (id, v): double-cast vector view. Norms are NOT precomputed —
  // cosineSim normalizes inside its fused loop. Null embeddings are
  // dropped here, centrally: every consumer feeds a UDF or a typed
  // array loop that would NPE on a null vector.
  // NOTE (round 6, measured): a Fan.out repartition here was tried and
  // REVERTED — the ANN gate queries do light per-vector work (10-query
  // cosine scans, small windows), and the same-JVM A/B showed the fan's
  // 32-task stages costing more than the serial pass saved (ann_lsh
  // 0.32 s unfanned vs 0.63 s fanned; ann_topk 0.22 vs 0.30). The
  // heavy-per-pair embedding near-dup operator keeps its fan (Dedup).
  private def normed(emb: DataFrame, idCol: String): DataFrame =
    emb.filter(col("embedding").isNotNull)
      .select(col(idCol),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Exact top-k cosine neighbors for each query vector (query set =
    * vec_id < nQueries). Output (query_id, neighbor_id, rank). The
    * pairwise cosine is the native codegen'd expression
    * [[graft.plans.CosineSim]] — one fused loop per pair. */
  def bruteForceTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val corpus = normed(emb, "vec_id")
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.plans.Functions.cosineSim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic Lloyd's k-means for the IVF coarse quantizer: initial
    * centroids are the k lowest-id vectors (no RNG), fixed iteration
    * count. Trains on a driver-side sample — the quantizer is a tiny
    * model; assignment and search stay distributed. */
  def kmeans(sample: Array[Array[Double]], k: Int,
             iters: Int = 10): Array[Array[Double]] = {
    val dim = sample.head.length
    var centroids = sample.take(k).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centroids
  }

  def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestCentroids(v: Array[Double], cs: Array[Array[Double]],
                               n: Int): Seq[Int] =
    cs.indices.sortBy { c =>
      var d = 0.0; var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      d
    }.take(n)

  /** IVF ANN: corpus bucketed into k-means cells; each query probes its
    * `nProbe` nearest cells and ranks candidates by exact cosine — the
    * classic inverted-file index. Same output schema as
    * [[bruteForceTopK]]; recall vs brute force asserted in tests and in
    * the gate (see [[ivfRecallGate]]).
    *
    * The quantizer trains on a BOUNDED deterministic sample: a hash-mod
    * slice of the corpus, capped at `nCells * 256` vectors via a
    * distributed ordered limit (TakeOrderedAndProject — only the cap
    * ever reaches the driver). Assignment and search stay distributed,
    * so the operator survives arbitrary corpus sizes. */
  def ivfTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = normed(emb, "vec_id")
    val maxSample = nCells * 256
    val ids = corpus.select(col("vec_id").cast("long"), col("v"))
      .as[(Long, Array[Double])]
    // deterministic spread sample; if the hash slice is too thin for k
    // centroids (tiny corpora), fall back to the ordered prefix
    val sliced = ids.filter(pmod(hash(col("vec_id")), lit(4)) === 0)
      .orderBy("vec_id").limit(maxSample).collect()
    val sampleRows =
      if (sliced.length >= nCells) sliced
      else ids.orderBy("vec_id").limit(maxSample).collect()
    if (sampleRows.isEmpty)
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("neighbor_id"),
          lit(0).as("rank")).limit(0)
    val sample = sampleRows.sortBy(_._1).map(_._2)
    val centroids = spark.sparkContext.broadcast(
      kmeans(sample, math.min(nCells, sample.length)))
    val cellUdf = udf((v: Seq[Double]) =>
      nearestCentroid(v.toArray, centroids.value))
    val probeUdf = udf((v: Seq[Double]) =>
      nearestCentroids(v.toArray, centroids.value, nProbe))
    val cells = corpus.withColumn("cell", cellUdf(col("v")))
    val queries = cells.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(probeUdf(col("v"))).as("cell"))
    val scored = cells.join(broadcast(queries),
        Seq("cell")).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.plans.Functions.cosineSim(col("qv"), col("v")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Random hyperplanes (deterministic seed) for an LSH signature. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH-bucketed ANN, multi-band: `bands` signatures of `bits` sign
    * bits each; a corpus vector is a candidate for a query if they share
    * at least one (band, key) bucket; candidates are ranked by exact
    * cosine. Recall is tuned by `bands` (more bands = higher recall),
    * per-bucket population by `bits` (more bits = smaller buckets) —
    * the standard hyperplane-LSH recall/cost dial. Same output schema
    * as [[bruteForceTopK]]; the bucket join is distributed on
    * (band, key), so no side is ever scanned whole per query. */
  def lshTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              bits: Int = 4, bands: Int = 24): DataFrame = {
    val spark = emb.sparkSession
    // empty corpus → empty result (same guard as ivfTopK), not a
    // NoSuchElementException out of first(); null vectors must not be
    // the dimension probe either
    val dimRow = emb.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).limit(1).collect()
    if (dimRow.isEmpty)
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("neighbor_id"),
          lit(0).as("rank")).limit(0)
    val dim = dimRow(0).getInt(0)
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, bits * bands))
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
    val corpus = normed(emb, "vec_id")
    val banded = corpus.select(col("vec_id"), col("v"),
      posexplode(keysUdf(col("v"))).as(Seq("band", "bkey")))
    val queries = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("band"), col("bkey"))
    val cand = banded.join(broadcast(queries), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.plans.Functions.cosineSim(col("qv"), col("v")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Gate surface for an approximate top-k: per-query recall against the
    * exact brute-force top-k, reduced to a deterministic, hashable
    * `(query_id, recall_ok)` table. The DuckDB oracle recomputes the
    * query set and asserts `recall_ok = true` for every query — so a
    * recall regression (or a broken bucketing join) turns the gate red
    * instead of passing a rows-only check. */
  def recallGate(approx: DataFrame, brute: DataFrame,
                 minRecall: Double): DataFrame = {
    val truth = brute.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"))
    val hits = brute.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    truth.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hit"), lit(0L)) >= col("n_truth") * minRecall)
          .as("recall_ok"))
  }

  /** [[lshTopK]] recall gate (driver query `ann_lsh`). */
  def lshRecallGate(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
                    bits: Int = 4, bands: Int = 24,
                    minRecall: Double = 0.6): DataFrame =
    recallGate(lshTopK(emb, k, nQueries, bits, bands),
      bruteForceTopK(emb, k, nQueries), minRecall)

  /** [[ivfTopK]] recall gate (driver query `ann_ivf`). */
  def ivfRecallGate(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
                    nCells: Int = 16, nProbe: Int = 12,
                    minRecall: Double = 0.6): DataFrame =
    recallGate(ivfTopK(emb, k, nQueries, nCells, nProbe),
      bruteForceTopK(emb, k, nQueries), minRecall)
}
