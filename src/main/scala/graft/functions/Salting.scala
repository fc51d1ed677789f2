package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys (north rule; replaces
  * the reference's manual split/merge partial+final aggregation,
  * IceCLI.java:146-194,592-813).
  *
  * Phase 1 groups by (keys, salt) so a hot key's rows spread over
  * `saltBuckets` reducers; phase 2 sums the partials per key.
  *
  * Salt derivation, in preference order:
  *
  *  1. `uniqueKeys` (a row-identifying column set, e.g. the row's
  *     natural key): salt = hash of those columns — fully DETERMINISTIC,
  *     so a fetch-failure stage retry recomputes identical map output
  *     (no SPARK-23207-class double-count/drop risk), and a hot GROUP
  *     key still spreads because its rows differ in the identifying
  *     columns. This is the production path; every in-repo caller
  *     passes one.
  *  2. No `uniqueKeys`: a per-row ordinal salt
  *     (hash(monotonically_increasing_id())). A salt derived from the
  *     row VALUES alone would degenerate to a pure function of the
  *     group key whenever a hot key's rows are exact duplicates, which
  *     silently collapses the two-phase split back to one reducer — so
  *     the ordinal is the only general fallback. CAVEAT: the ordinal
  *     depends on physical row placement, so on a cluster a partial
  *     stage retry after a fetch failure can re-salt rows differently
  *     than the already-fetched map output (SPARK-23207 class). Callers
  *     without a natural unique key must feed this path a DETERMINISTIC
  *     input (a committed table scan / checkpoint, not live shuffle
  *     output); the per-run OUTPUT is parallelism-independent either
  *     way because phase 2 re-sums per key.
  */
object Salting {

  private def salt(saltBuckets: Int, uniqueKeys: Seq[String]): Column =
    if (uniqueKeys.nonEmpty)
      pmod(hash(uniqueKeys.map(col): _*), lit(saltBuckets))
    else pmod(hash(monotonically_increasing_id()), lit(saltBuckets))

  def saltedCount(df: DataFrame, keys: Seq[String],
                  saltBuckets: Int = 32,
                  uniqueKeys: Seq[String] = Nil): DataFrame = {
    df.withColumn("_salt", salt(saltBuckets, uniqueKeys))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** Salted two-phase sum over a numeric column. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                alias: String, saltBuckets: Int = 32,
                uniqueKeys: Seq[String] = Nil): DataFrame = {
    df.withColumn("_salt", salt(saltBuckets, uniqueKeys))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(alias))
  }
}
