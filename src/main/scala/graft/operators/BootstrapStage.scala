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
  val MinBootstrapScore = 0.05

  /** Candidate scores: for each non-seed path (same arg types), score =
    * #distinct arg pairs shared with seed instances; totalCount =
    * #distinct arg pairs of the path (Bootstrap.java:362-371). */
  def sharedArgScores(inst: Dataset[PathInstance],
                      seedPaths: Set[String]): DataFrame = {
    val df = inst.toDF().select(col("path"), col("type1"), col("type2"),
      concat_ws(":::", col("arg1"), col("arg2")).as("arg_pair"))
    val seedPairs = df.filter(col("path").isin(seedPaths.toSeq: _*))
      .select(col("arg_pair")).distinct()
    val totals = df.groupBy(col("path"))
      .agg(countDistinct(col("arg_pair")).as("total_count"))
    val shared = df.join(broadcast(seedPairs), Seq("arg_pair"))
      .groupBy(col("path"))
      .agg(countDistinct(col("arg_pair")).as("score"))
    totals.join(shared, Seq("path"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .filter(!col("path").isin(seedPaths.toSeq: _*))
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
