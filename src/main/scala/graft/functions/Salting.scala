package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys (north rule; replaces
  * the reference's manual split/merge partial+final aggregation,
  * IceCLI.java:146-194,592-813).
  *
  * Phase 1 groups by (keys, salt) so a hot key's rows spread over
  * `saltBuckets` reducers; phase 2 sums the partials per key. The salt
  * mixes a per-partition row ordinal into the row hash — a salt
  * derived from the row VALUES alone degenerates to a pure function of
  * the key whenever a hot key's rows are exact duplicates (or the
  * input is already projected down to the key columns), which silently
  * turns the two-phase split back into one reducer per hot key. Salt
  * values therefore vary with physical row placement, but the OUTPUT
  * never depends on which bucket a row landed in: phase 2 re-sums per
  * key, so results are identical at any parallelism.
  */
object Salting {

  private def salt(saltBuckets: Int) =
    pmod(hash(monotonically_increasing_id()), lit(saltBuckets))

  def saltedCount(df: DataFrame, keys: Seq[String],
                  saltBuckets: Int = 32): DataFrame = {
    df.withColumn("_salt", salt(saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** Salted two-phase sum over a numeric column. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                alias: String, saltBuckets: Int = 32): DataFrame = {
    df.withColumn("_salt", salt(saltBuckets))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(alias))
  }
}
