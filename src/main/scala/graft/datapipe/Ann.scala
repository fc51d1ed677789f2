package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the
  *    (small) query set against the full corpus — the correctness
  *    baseline. Scales linearly in corpus size per query.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by signature
  *    prefix, queries probe only their own bucket. The scale path:
  *    bucket count grows with corpus size, per-bucket work stays
  *    bounded. Recall vs brute force is asserted in DatapipeSpec.
  */
object Ann {

  private def normed(emb: DataFrame, idCol: String): DataFrame =
    emb.select(col(idCol),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), _ + _)))

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
    * [[bruteForceTopK]]; recall vs brute force asserted in tests. */
  def ivfTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = normed(emb, "vec_id")
    val sample = corpus.select(col("vec_id").cast("long"), col("v"))
      .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
    val centroids = spark.sparkContext.broadcast(kmeans(sample, nCells))
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

  /** LSH-bucketed ANN: signature = sign bits against `bits` random
    * hyperplanes; each query probes only vectors sharing its bucket.
    * Same output schema as [[bruteForceTopK]]. */
  def lshTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              bits: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, bits))
    val sigUdf = udf((v: Seq[Double]) => {
      val ps = planes.value
      ps.indices.foldLeft(0) { (acc, i) =>
        val d = v.indices.foldLeft(0.0)((s, j) => s + v(j) * ps(i)(j))
        if (d >= 0) acc | (1 << i) else acc
      }
    })
    val corpus = normed(emb, "vec_id").withColumn("sig", sigUdf(col("v")))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("sig").as("qsig"))
    val scored = corpus.join(broadcast(queries),
        col("sig") === col("qsig") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.plans.Functions.cosineSim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
