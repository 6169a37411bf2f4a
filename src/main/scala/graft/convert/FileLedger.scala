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
  * only; reads union all batch files. Works on any Hadoop filesystem.
  */
final class FileLedger(dir: String, conf: Configuration) {
  private val dirPath = new Path(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)

  def seen(): Set[String] = {
    if (!fs.exists(dirPath)) return Set.empty
    val out = mutable.Set.empty[String]
    val it = fs.listStatus(dirPath).iterator
    it.foreach { st =>
      if (st.isFile && st.getPath.getName.startsWith("batch-")) {
        val in = fs.open(st.getPath)
        try Source.fromInputStream(in, "UTF-8").getLines().foreach { l =>
          if (l.nonEmpty) out += l
        } finally in.close()
      }
    }
    out.toSet
  }

  def add(paths: Seq[String]): Unit = {
    if (paths.isEmpty) return
    if (!fs.exists(dirPath)) fs.mkdirs(dirPath)
    val f = new Path(dirPath, s"batch-${UUID.randomUUID().toString}.txt")
    val out = fs.create(f, false)
    try out.write(paths.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
