package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for stateful streaming queries.
  *
  * The reference pipeline is stateless per file (processing-time pacing
  * only, `main.py:595`), so its "state" is just the file ledger. This
  * engine's streaming surface (watermarked dedup, sessionization,
  * windowed aggregation) keeps real per-key state, and at 100 TB /
  * 1000-executor scale that state no longer fits the default
  * HDFS-backed in-memory provider: a dedup over billions of keys or
  * month-long session windows needs state that spills. Spark's bundled
  * RocksDB provider keeps state off-heap on local disk with changelog
  * checkpointing, bounding executor memory regardless of key
  * cardinality.
  *
  * The provider class is read once at query START and baked into the
  * checkpoint, so it is applied the same way the stateful-shuffle
  * sizing is: set around `writeStream.start()` on a fresh checkpoint.
  */
object StateBackend {

  /** FQCN of Spark's bundled RocksDB state store provider. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Runs `body` (which should START a streaming query) with RocksDB as
    * the state-store provider, restoring the previous conf afterwards.
    * Changelog checkpointing is enabled so each commit uploads only the
    * delta, not a full RocksDB snapshot — the difference between O(state)
    * and O(changed-keys) checkpoint traffic on a large cluster.
    */
  def withRocksDB[T](spark: SparkSession)(body: => T): T = {
    val prevProvider = spark.conf.getOption(ProviderKey)
    val prevChangelog = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ProviderKey, RocksDBProvider)
    spark.conf.set(ChangelogKey, "true")
    try body
    finally {
      prevProvider match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      prevChangelog match {
        case Some(v) => spark.conf.set(ChangelogKey, v)
        case None    => spark.conf.unset(ChangelogKey)
      }
    }
  }
}
