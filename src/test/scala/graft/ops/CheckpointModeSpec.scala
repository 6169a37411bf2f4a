package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The [[Checkpoints]] routing contract (round-15 fault posture):
  *
  *  - default mode (conf unset) stays `localCheckpoint` — nothing is
  *    written to any checkpoint directory, so the driver gate / bench
  *    path is byte-for-byte the pre-helper behavior;
  *  - `spark.graft.checkpoint.dir` set → reliable `checkpoint()`: the
  *    staged frame's blocks live as FILES under the directory (what makes
  *    them survive executor loss on a real cluster), and a dedup + a
  *    graph fixpoint query — the heaviest stageCheckpoint consumers — run
  *    green end-to-end in that mode.
  *
  * The reliable leg runs in a `newSession()` so the conf flag and the
  * rebuilt SessionFixtures stay isolated from every other suite sharing
  * the test SparkContext.
  */
class CheckpointModeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rddDirs(root: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        f.listFiles().toSeq.flatMap(walk) :+ f
      else Seq(f)
    walk(root).filter(f => f.isDirectory && f.getName.startsWith("rdd-"))
  }

  test("default mode: stage() localCheckpoints — no files written, rows intact") {
    val df = Checkpoints.stage(spark.range(100).toDF("n"))
    assert(df.count() == 100)
    // localCheckpoint presents as a LogicalRDD whose RDD is locally
    // checkpointed (executor-block-backed, not file-backed)
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    assert(rdds.nonEmpty && rdds.forall(_.isCheckpointed),
      "stage() must be an eager checkpoint in default mode")
  }

  test("reliable mode: stage() writes file-backed checkpoints and the " +
    "heaviest fixture/fixpoint queries run green") {
    val ckpt = Files.createTempDirectory("graft-reliable-ckpt").toFile
    val s2 = spark.newSession()
    s2.conf.set(Checkpoints.DirConf, ckpt.getAbsolutePath)

    // direct routing proof: the staged frame must be file-backed
    val staged = Checkpoints.stage(s2.range(50).toDF("n"))
    assert(staged.count() == 50)
    assert(rddDirs(ckpt).nonEmpty,
      "reliable mode must leave rdd-* checkpoint data under the conf dir")

    // end-to-end: one dedup (minhash pair fixture + CC fixpoint feeds) and
    // one graph fixpoint (label propagation) — the new session rebuilds
    // their SessionFixtures, so the fixture checkpoints route reliably too
    val before = rddDirs(ckpt).size
    val dedup = graft.SparkEntry.queries("q_dedup_minhash")(s2, dir)
    assert(dedup.count() > 0, "q_dedup_minhash must be green in reliable mode")
    val graph = graft.SparkEntry.queries("q_graph_labelprop")(s2, dir)
    assert(graph.count() > 0, "q_graph_labelprop must be green in reliable mode")
    assert(rddDirs(ckpt).size > before,
      "the queries' stageCheckpoint calls must have routed to the reliable dir")
  }
}
