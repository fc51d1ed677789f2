package graft.operators

import graft.core.PathInstance
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage: path bootstrap — score candidate paths by the arg pairs they
  * share with the seed paths' instances (A10/J2/J3,
  * Bootstrap.java:238-391), dedupe by repr and cap the candidate list
  * (O2, Bootstrap.java:46-55,262-286).
  *
  * Join shape at scale: the seed instance set is the (small) output of a
  * semi-join on a handful of seed paths → broadcast-hash join against
  * the full instance table on `argPair`; the heavy self-join J3 is
  * avoided by reducing the seed side first.
  */
object BootstrapStage {

  val MaxBootstrappedItems = 200
  /** Event-tree variant cap (events/EventBootstrap.java:44-53). */
  val MaxBootstrappedEvents = 100
  val MinBootstrapScore = 0.05

  /** Candidate scores: for each non-seed path (same arg types), score =
    * #distinct arg pairs shared with seed instances; totalCount =
    * #distinct arg pairs of the path (Bootstrap.java:362-371). */
  /** @param rejectPaths user-rejected candidates, excluded from the
    *   output (the GUI "Iterate" fold, Bootstrap.java:211-222,341-342 —
    *   an anti-join on the reject set). */
  def sharedArgScores(inst: Dataset[PathInstance],
                      seedPaths: Set[String],
                      rejectPaths: Set[String] = Set.empty): DataFrame = {
    // persisted: three consumers (seed pairs, per-path totals, the
    // shared join) — keeps the upstream mining chain from running once
    // per consumer when the caller passes an unpersisted instance
    // table. Released by the caller's clearCache.
    // struct key, not a string concat: argument surfaces are arbitrary
    // text, so a separator-based key ("a:::b") would collide distinct
    // pairs whose surfaces contain the separator, silently inflating
    // the shared/total distinct counts. Struct equality is exact and
    // stays inside codegen; the oracle's concat keys remain comparable
    // because only the resulting COUNTS cross engines.
    val df = inst.toDF().select(col("path"), col("type1"), col("type2"),
      struct(col("arg1"), col("arg2")).as("arg_pair"))
      .persist()
    val seedPairs = df.filter(col("path").isin(seedPaths.toSeq: _*))
      .select(col("arg_pair")).distinct()
    val totals = df.groupBy(col("path"))
      .agg(countDistinct(col("arg_pair")).as("total_count"))
    val shared = df.join(broadcast(seedPairs), Seq("arg_pair"))
      .groupBy(col("path"))
      .agg(countDistinct(col("arg_pair")).as("score"))
    val excluded = (seedPaths ++ rejectPaths).toSeq
    totals.join(shared, Seq("path"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .filter(!col("path").isin(excluded: _*))
  }

  /** One bootstrap iteration (Bootstrap.java:211-301): fold the user's
    * labels into the seed/reject sets, re-score, re-rank. */
  def iterate(inst: Dataset[PathInstance], reprTable: DataFrame,
              seedPaths: Set[String], rejectPaths: Set[String],
              cap: Int = MaxBootstrappedItems): DataFrame =
    candidates(sharedArgScores(inst, seedPaths, rejectPaths), reprTable, cap)

  /** A11 (the alternative bootstrap scorer, embedding flavor —
    * IcePath.java:176-191 + WordEmbedding.java:87-128): centroid = sum
    * of the seed reprs' word vectors (driver-side — seeds are a
    * handful), broadcast; candidate score = cosine(centroid, candidate
    * repr vector). The embedding map is broadcast; scoring is a narrow
    * map over the repr table. */
  def embeddingScores(reprTable: DataFrame, seedReprs: Set[String],
                      embedding: Map[String, Array[Double]]): DataFrame = {
    val spark = reprTable.sparkSession
    import spark.implicits._
    val dim = embedding.headOption.map(_._2.length).getOrElse(0)
    def vecOf(repr: String): Array[Double] = {
      val v = new Array[Double](dim)
      repr.split("\\s+").foreach { w =>
        embedding.get(w.toLowerCase).foreach { e =>
          var i = 0; while (i < dim) { v(i) += e(i); i += 1 }
        }
      }
      v
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na) / math.sqrt(nb)
    }
    val centroid = {
      val c = new Array[Double](dim)
      seedReprs.foreach { r =>
        val v = vecOf(r); var i = 0; while (i < dim) { c(i) += v(i); i += 1 }
      }
      c
    }
    val bcE = spark.sparkContext.broadcast(embedding)
    val bcC = spark.sparkContext.broadcast(centroid)
    val score = udf { repr: String =>
      val e = bcE.value
      val v = new Array[Double](bcC.value.length)
      repr.split("\\s+").foreach { w =>
        e.get(w.toLowerCase).foreach { x =>
          var i = 0; while (i < v.length) { v(i) += x(i); i += 1 }
        }
      }
      graft.functions.Quantize.q6(cos(bcC.value, v))
    }
    reprTable.select(col("type1"), col("path"), col("type2"), col("repr"))
      .withColumn("score", score(col("repr")))
      .filter(!col("repr").isin(seedReprs.toSeq: _*))
  }

  /** Rank candidates, dedupe by repr keeping the best-scored path
    * (window row_number=1 — O2), floor the score, cap the list. */
  def candidates(scores: DataFrame, reprTable: DataFrame,
                 cap: Int = MaxBootstrappedItems): DataFrame = {
    val w = Window.partitionBy(col("repr"))
      .orderBy(desc("norm_score"), asc("path"))
    scores.join(reprTable.select(col("path"), col("repr")).distinct(), Seq("path"))
      .withColumn("norm_score",
        col("score").cast("double") / greatest(col("total_count"), lit(1L)))
      .filter(col("norm_score") >= MinBootstrapScore)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(desc("norm_score"), asc("path"))
      .limit(cap)
  }
}
