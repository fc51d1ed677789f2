package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out ahead of CPU-heavy narrow stages (guide §2.5
  * "input skew": one huge unsplittable file serializes every downstream
  * narrow stage onto one task; guide §8: shuffle a few light bytes per
  * row to parallelize the heavy per-row work).
  *
  * A single small parquet file scans as ONE task, and Spark cannot
  * split it further (row-group granularity) — so a narrow chain of
  * expensive per-row work (NLP annotate, shingle/signature UDFs,
  * hyperplane projections) runs on one core regardless of cluster
  * size. `out` repartitions up to the cluster's default parallelism
  * ONLY when the input is under-parallel, hashing on a caller-supplied
  * deterministic key (no round-robin: hash placement is stable under
  * stage retry, SPARK-23207). On a real multi-file/multi-row-group
  * input the check sees enough partitions and the whole thing is a
  * no-op — the shuffle is a local-mode/straggler guard, not a constant
  * tax, and what it moves is the pre-synthesis row (ids, short text),
  * never derived heavy columns.
  */
object Fan {

  /** Target parallelism for the fan-out, parameterised per session:
    * `spark.graft.fanout.parallelism` (<= 0 disables the fan
    * entirely). Defaults to the cluster's `defaultParallelism` — i.e.
    * it scales with the deployment, never a constant tuned to one
    * box. */
  def target(df: DataFrame): Int =
    df.sparkSession.conf
      .getOption("spark.graft.fanout.parallelism").map(_.toInt)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  /** `df` repartitioned to [[target]] on `keys` iff it currently has
    * fewer partitions than that. Keys must be deterministic row
    * properties (doc_id, vec_id).
    *
    * ONLY for exchange-free frames (scan + narrow ops): the partition
    * probe is `df.rdd`, and on a plan containing exchanges AQE
    * materializes those stages EAGERLY at probe time — use [[outLike]]
    * with a scan-level probe for derived frames. */
  def out(df: DataFrame, keys: Column*): DataFrame = {
    val p = target(df)
    if (p <= 0 || df.rdd.getNumPartitions >= p) df
    else df.repartition(p, keys: _*)
  }

  /** Like [[out]] but probes the parallelism of `probe` (an
    * exchange-free scan-level frame, e.g. the corpus the derived frame
    * was joined from) instead of `df` itself — for frames whose own
    * `.rdd` would eagerly execute upstream exchanges. When the probe
    * scan is parallel enough the derived frame inherits real
    * parallelism through its joins and this is a no-op. */
  def outLike(df: DataFrame, probe: DataFrame, keys: Column*): DataFrame = {
    val p = target(df)
    if (p <= 0 || probe.rdd.getNumPartitions >= p) df
    else df.repartition(p, keys: _*)
  }
}
