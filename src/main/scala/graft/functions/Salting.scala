package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys (north rule; replaces
  * the reference's manual split/merge partial+final aggregation,
  * IceCLI.java:146-194,592-813).
  *
  * Phase 1 groups by (keys, salt) so a hot key's rows spread over
  * `saltBuckets` reducers; phase 2 sums the partials per key. The salt
  * is derived from a hash of the whole row (deterministic, no RNG), so
  * results are identical at any parallelism.
  */
object Salting {

  def saltedCount(df: DataFrame, keys: Seq[String],
                  saltBuckets: Int = 32): DataFrame = {
    val allCols = df.columns.map(col).toSeq
    df.withColumn("_salt", pmod(hash(allCols: _*), lit(saltBuckets)))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** Salted two-phase sum over a numeric column. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                alias: String, saltBuckets: Int = 32): DataFrame = {
    val allCols = df.columns.map(col).toSeq
    df.withColumn("_salt", pmod(hash(allCols: _*), lit(saltBuckets)))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(alias))
  }
}
