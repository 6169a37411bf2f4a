package graft.ops

import org.apache.spark.sql.Dataset

/** The library-wide staging checkpoint: every fixture / fixpoint
  * materialization (minhash pair tables, LPA label rounds, k-core peels,
  * bounded model tables) goes through [[stage]] instead of calling
  * `localCheckpoint()` directly, so ONE switch decides the fault posture:
  *
  *  - DEFAULT (`spark.graft.checkpoint.dir` unset): `localCheckpoint()` —
  *    blocks live on the executors that computed them (MEMORY_AND_DISK),
  *    zero filesystem round-trip. Correct and fastest for the single-JVM
  *    driver gate and `local[32]` benches, but the blocks are
  *    UNRECOMPUTABLE: on a real cluster, losing one executor (preemption,
  *    OOM-kill, spot reclaim) fails every later query sharing the staged
  *    frame with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the suite itself has
  *    measured exactly that failure when blocks were swept.
  *
  *  - CLUSTER (`spark.graft.checkpoint.dir = <fault-tolerant path>`):
  *    reliable `Dataset.checkpoint()` — the staged frame is written to the
  *    HDFS-compatible directory and re-read from it, so executor loss
  *    costs a re-read, never a failed query. The directory is set on the
  *    SparkContext once per configured value; files are cleaned by the
  *    deployment (or `spark.cleaner.referenceTracking.cleanCheckpoints`),
  *    matching Spark's own reliable-checkpoint lifecycle.
  *
  * Both forms are EAGER and both present downstream as a `LogicalRDD`
  * scan, so plan pins, [[SessionFixtures.pinnedRddIds]] and
  * [[Dedup.releaseCheckpoint]] (a no-op on file-backed RDDs) behave
  * identically under either mode. CheckpointModeSpec runs a dedup and a
  * graph fixpoint green in reliable mode and proves the routing by the
  * checkpoint files it leaves behind.
  */
private[graft] object Checkpoints {

  /** Runtime conf key selecting reliable checkpointing (value = directory).
    * The underlying `setCheckpointDir` is CONTEXT-global: one directory
    * per SparkContext. Configure the same value on every session of a
    * context — with two sessions naming different directories, each
    * stage() re-points the context and a concurrently launching
    * checkpoint may land its files under the other session's directory
    * (both still reliable, just co-mingled).
    */
  val DirConf = "spark.graft.checkpoint.dir"

  // last (context, directory) applied: setCheckpointDir mints a fresh
  // UUID subdir per call, so re-setting per stage() would litter one dir
  // per checkpoint — but the cache must be keyed on the CONTEXT, not the
  // JVM: after a context restart with the same conf value, a static
  // string cache would skip setCheckpointDir on the NEW context and
  // checkpoint() would throw "Checkpoint directory has not been set"
  @volatile private var applied: (org.apache.spark.SparkContext, String) = null

  def stage[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (applied != ((sc, dir))) synchronized {
          if (applied != ((sc, dir))) {
            sc.setCheckpointDir(dir)
            applied = (sc, dir)
          }
        }
        // persist before the eager checkpoint: without it Spark computes
        // the plan TWICE (the eager count job, then the checkpoint-file
        // write job recomputes from lineage — the documented
        // RDD.checkpoint-without-persist behavior), doubling every
        // fixpoint round in exactly the mode built for big clusters.
        // With the cache, the write job reads the just-computed blocks;
        // unpersist after (the files are the durable copy).
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try ds.checkpoint()
        finally ds.unpersist(blocking = false)
      case None => ds.localCheckpoint()
    }
  }

  /** `.stageCheckpoint()` — the call-site spelling; replaces every raw
    * `.localCheckpoint()` in query/fixture code.
    */
  implicit final class StageOps[T](private val ds: Dataset[T]) extends AnyVal {
    def stageCheckpoint(): Dataset[T] = stage(ds)
  }
}
