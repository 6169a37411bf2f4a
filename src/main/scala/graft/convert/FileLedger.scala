package graft.convert

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable
import scala.io.Source

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Persistent processed-file ledger: the continuous converter's
  * deduplication state, equivalent to Beam's
  * `MatchContinuously(has_deduplication=True)` seen-file tracking
  * (reference main.py:604-608) and to the Structured Streaming file-source
  * checkpoint.
  *
  * Layout: `<dir>/batch-<uuid>.txt`, one processed path per line. Append-
  * only; reads union all batch files; [[compact]] folds accumulated batch
  * files back into one. Works on any Hadoop filesystem.
  *
  * Driver-memory bound: [[seen]] materializes every processed path in one
  * driver-side Set — the same centralized-match semantics as the
  * reference's `MatchContinuously` (and Structured Streaming's own
  * file-source log, which also keeps seen entries on the driver). At
  * ~100 bytes/path, 10M processed files ≈ 1 GB of driver heap: fine for
  * the CDC landing-zone cadence this job targets (thousands of files/day
  * for years), and the ceiling is file COUNT, not data volume — 100 TB in
  * large Avro containers is millions of paths, not billions. Past that,
  * the [[AvroToParquetJob.runStreaming]] path already scales further (its
  * checkpoint log is read incrementally), so the ledger deliberately stays
  * simple rather than re-implementing a partitioned state store.
  */
final class FileLedger(dir: String, conf: Configuration) {
  private val dirPath = new Path(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)

  private def batchFiles(): Array[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(dirPath)) Array.empty
    else fs.listStatus(dirPath).filter(st =>
      st.isFile && st.getPath.getName.startsWith("batch-"))

  def seen(): Set[String] = {
    val out = mutable.Set.empty[String]
    batchFiles().foreach { st =>
      val in = fs.open(st.getPath)
      try Source.fromInputStream(in, "UTF-8").getLines().foreach { l =>
        if (l.nonEmpty) out += l
      } finally in.close()
    }
    out.toSet
  }

  def add(paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    if (!fs.exists(dirPath)) fs.mkdirs(dirPath)
    writeBatch(paths)
  }

  private def writeBatch(paths: Seq[String]): Path = {
    val f = new Path(dirPath, s"batch-${UUID.randomUUID().toString}.txt")
    val out = fs.create(f, false)
    try out.write(paths.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f
  }

  /** Folds the accumulated batch files into one when their count exceeds
    * `maxBatchFiles`, so a long-running continuous job's ledger reads stay
    * one file-open, not one per historical poll (a year of 30s polls is
    * ~1M batch files — 1M namenode opens per cycle before compaction).
    *
    * Crash-safe by ordering alone: the merged file is written FIRST, then
    * the inputs are deleted. A crash in between leaves duplicate entries,
    * which the union-of-sets read semantics make harmless; a crash before
    * the merged write leaves the ledger untouched. Single-writer (the
    * polling driver), same as the reference's centralized matcher.
    *
    * Returns the number of batch files merged, 0 if below the threshold.
    */
  def compact(maxBatchFiles: Int = 64): Int = {
    val files = batchFiles()
    if (files.length <= maxBatchFiles) return 0
    val all = seen()
    if (all.isEmpty) return 0
    writeBatch(all.toSeq.sorted)
    files.foreach(st => fs.delete(st.getPath, false))
    files.length
  }
}
