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

  /** `df` repartitioned to `defaultParallelism` on `keys` iff it
    * currently has fewer partitions than that. Keys must be
    * deterministic row properties (doc_id, vec_id). */
  def out(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, keys: _*)
  }
}
