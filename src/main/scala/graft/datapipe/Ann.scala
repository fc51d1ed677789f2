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
