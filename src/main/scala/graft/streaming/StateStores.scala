package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store configuration for the stateful streaming surfaces.
  *
  * The default HDFS-backed provider keeps every key's state as JVM
  * objects in executor heap (one full map per maintained version) — at
  * the keyspaces a 100-TB event stream implies (10⁸⁺ users in
  * sessionization state at once) that is an executor OOM, not a spill.
  * The RocksDB provider (`rocksdbjni` ships with Spark) keeps state
  * off-heap in a native LSM tree with block-cache-bounded memory and
  * disk spill, changing the scale story from "state must fit in heap"
  * to "state must fit on local disk" — the configuration the three
  * streaming gates run under (q_stream_events, q_stream_hourly,
  * q_stream_sessions; see BASELINE.md for recorded state metrics).
  *
  * The provider is a session-level SQL conf read at query start and
  * pinned into the query's checkpoint; setting it before `start()` is
  * the supported per-query hook.
  */
object StateStores {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route stateful streaming state through RocksDB for queries started
    * after this call. Idempotent; batch queries are unaffected. */
  def useRocksDb(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      RocksDbProvider)
    // changelog checkpointing: upload per-batch deltas instead of
    // full SST snapshots — the commit-latency configuration a
    // continuous deployment would run with
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }
}
