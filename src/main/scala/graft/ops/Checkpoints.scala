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

  /** Runtime conf key selecting reliable checkpointing (value = directory). */
  val DirConf = "spark.graft.checkpoint.dir"

  // last directory applied to the context: setCheckpointDir mints a fresh
  // UUID subdir per call, so re-setting per stage() would litter one dir
  // per checkpoint; one JVM drives one context, a volatile slot suffices
  @volatile private var applied: String = null

  def stage[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (applied != dir) synchronized {
          if (applied != dir) {
            spark.sparkContext.setCheckpointDir(dir)
            applied = dir
          }
        }
        ds.checkpoint()
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
