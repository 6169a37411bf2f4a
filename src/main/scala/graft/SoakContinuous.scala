package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Long-duration soak of [[graft.convert.AvroToParquetJob.runContinuous]]
  * (verdict r16 #3): the reference is a continuously-running service
  * (main.py:601-613, MatchContinuously polls the landing zone forever),
  * but the longest demonstrated run before this probe was a few polls.
  * This main drives 200+ polls on one ledger with:
  *
  *  - files ARRIVING before every poll (two folders, so every poll
  *    exercises the per-(schema, folder) write path);
  *  - THREE writer-schema generations switched mid-run (gen2 adds a
  *    string column at poll 70, gen3 adds a double column at poll 140 —
  *    additive evolution, so the read-back accounting can name-merge);
  *  - the SHARDED ledger (4 shards) with per-poll compaction firing many
  *    times across the run (compact folds batch files past 64);
  *  - the driver's RETAINED heap sampled once per poll (forced GC, then
  *    used-heap — the statistic a leak actually moves, unlike raw used
  *    which mostly tracks allocation phase);
  *  - a RESTART leg: after the loop returns, a fresh poll on the same
  *    ledger dir converts only the post-loop arrivals, and a final empty
  *    poll reports discovered=0 (ledger exactly-once across restart).
  *
  * Pass criteria printed as `[soak] RESULT ok`:
  *  - every report has `failed` empty;
  *  - read-back rows == distinct uuids == rows produced (exactly-once);
  *  - retained-heap flatness: median over polls [160,200) must be under
  *    1.3× the median over polls [20,60) (warmup excluded);
  *  - restart-leg dedup: final poll discovers 0 files.
  *
  * A probe main, not a spec: ~200 Spark jobs plus per-poll forced GC is
  * minutes of wall clock — far beyond test-runner budget — and the
  * interesting output is the heap SERIES, which belongs in SURVEY, not
  * in an assert. Run: `sbt "runMain graft.SoakContinuous"` (optionally
  * `graft.SoakContinuous <polls>`).
  */
object SoakContinuous {

  /** CDC container writer with a generation knob. Gen 1 mirrors the
    * BenchData envelope (uuid + source_metadata + nullable payload);
    * gen 2 adds payload.extra (nullable string); gen 3 additionally adds
    * payload.score (nullable double). uuids are globally unique via
    * `idBase` so distinct-count read-back proves exactly-once.
    */
  private def writeGen(path: String, rows: Int, gen: Int, idBase: Long): Unit = {
    val extraFields =
      (if (gen >= 2) """,{"name":"extra","type":["null","string"]}""" else "") +
        (if (gen >= 3) """,{"name":"score","type":["null","double"]}""" else "")
    val schemaJson =
      s"""{"type":"record","name":"cdc_event","fields":[
        {"name":"uuid","type":"string"},
        {"name":"read_timestamp","type":{"type":"long","logicalType":"timestamp-millis"}},
        {"name":"source_metadata","type":{"type":"record","name":"sm","fields":[
          {"name":"schema","type":"string"},{"name":"table","type":"string"},
          {"name":"is_deleted","type":"boolean"},{"name":"change_type","type":"string"},
          {"name":"tx_id","type":["null","long"]},{"name":"lsn","type":["null","string"]},
          {"name":"primary_keys","type":{"type":"array","items":"string"}}]}},
        {"name":"payload","type":["null",{"type":"record","name":"p","fields":[
          {"name":"id","type":"long"},
          {"name":"name","type":["null","string"]},
          {"name":"qty","type":["null","int"]}$extraFields]}]}
      ]}"""
    val schema = new Schema.Parser().parse(schemaJson)
    val smSchema = schema.getField("source_metadata").schema()
    val pSchema = schema.getField("payload").schema().getTypes.get(1)
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
    w.create(schema, f)
    var i = 0
    while (i < rows) {
      val id = idBase + i
      val sm = new GenericData.Record(smSchema)
      sm.put("schema", "public"); sm.put("table", "soak")
      sm.put("is_deleted", Boolean.box(i % 10 == 0))
      sm.put("change_type", if (i % 3 == 0) "INSERT" else "UPDATE")
      sm.put("tx_id", Long.box(id)); sm.put("lsn", s"0/${id.toHexString}")
      sm.put("primary_keys", java.util.Arrays.asList("id"))
      val p = new GenericData.Record(pSchema)
      p.put("id", Long.box(id))
      p.put("name", s"name-$id")
      p.put("qty", Int.box((id % 100).toInt))
      if (gen >= 2) p.put("extra", s"x$id")
      if (gen >= 3) p.put("score", Double.box(id * 0.5))
      val rec = new GenericData.Record(schema)
      rec.put("uuid", s"u$id")
      rec.put("read_timestamp", Long.box(1704067200000L + id))
      rec.put("source_metadata", sm); rec.put("payload", p)
      w.append(rec)
      i += 1
    }
    w.close()
  }

  private def retainedHeapMb(): Long = {
    System.gc()
    val mu = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage
    mu.getUsed >> 20
  }

  private def median(xs: Seq[Long]): Long = {
    val s = xs.sorted
    if (s.isEmpty) 0L else s(s.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val targetPolls = if (args.nonEmpty) args(0).toInt else 200
    val filesPerPoll = 2
    val rowsPerFile = 150
    val folders = Array("orders", "events")

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-soak").toString
    val landing = s"$tmp/landing/avro"
    val out = s"$tmp/out"
    val ledgerDir = s"$tmp/ledger"

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-soak-continuous")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // Long-running-driver retention bounds (found BY this soak at 1000
      // polls): `spark.ui.enabled=false` does NOT disable the
      // AppStatusStore — every poll's jobs/stages/tasks and SQL
      // executions accrue in driver memory up to the DEFAULT caps
      // (1000/1000/100k items, 1000 SQL executions with full plan
      // graphs), which at ~5 jobs + ~10 tasks + ~3 executions per poll
      // means the heap climbs for thousands of polls before Spark's own
      // eviction kicks in (measured 65→98 MB over 1000 polls uncapped,
      // decelerating but unbounded until ~poll 10k). A continuous-mode
      // deployment should bound these; with the caps below the series
      // plateaus once each store saturates. Same recommendation recorded
      // in runContinuous's scaladoc.
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "5000")
      .config("spark.sql.ui.retainedExecutions", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var produced = 0L
    var nextFile = 0
    def genAt(poll: Int): Int =
      if (poll < targetPolls * 7 / 20) 1
      else if (poll < targetPolls * 7 / 10) 2
      else 3
    def produce(poll: Int): Unit = {
      var k = 0
      while (k < filesPerPoll) {
        val folder = folders(nextFile % folders.length)
        writeGen(s"$landing/$folder/f$nextFile.avro", rowsPerFile,
          genAt(poll), nextFile.toLong * rowsPerFile)
        produced += rowsPerFile
        nextFile += 1
        k += 1
      }
    }

    // runContinuous calls shouldStop twice per iteration: once as the
    // while-guard (BEFORE the poll — even call index: inject arrivals,
    // or stop), once before the sleep (AFTER the poll's runOnce+compact —
    // odd call index: sample the retained heap). This piggybacks the
    // soak's per-poll instrumentation on the production loop unchanged,
    // which is the point: the code under soak is runContinuous itself.
    val calls = new AtomicInteger(0)
    val heapSeries = scala.collection.mutable.ArrayBuffer.empty[Long]
    def hook(): Boolean = {
      val c = calls.getAndIncrement()
      if (c % 2 == 0) {
        val poll = c / 2
        if (poll >= targetPolls) true
        else { produce(poll); false }
      } else {
        val poll = (c - 1) / 2
        val mb = retainedHeapMb()
        heapSeries += mb
        if ((poll + 1) % 10 == 0 || poll == 0)
          println(s"[soak] poll=${poll + 1} gen=${genAt(poll)} " +
            s"retained_heap_mb=$mb files_seen=$nextFile")
        false
      }
    }

    val t0 = System.nanoTime()
    val reports = graft.convert.AvroToParquetJob.runContinuous(
      spark, s"$landing/*/*.avro", out, ledgerDir,
      intervalSeconds = 0, maxIterations = Int.MaxValue,
      shouldStop = hook _, ledgerShards = 4)
    val loopS = (System.nanoTime() - t0) / 1e9

    var ok = true
    val failedReports = reports.filter(_.failed.nonEmpty)
    if (failedReports.nonEmpty) {
      ok = false
      println(s"[soak] FAILED: ${failedReports.size} polls reported " +
        s"failed files, first=${failedReports.head.failed.take(3)}")
    }
    if (reports.size != targetPolls)
      println(s"[soak] note: ${reports.size} polls completed " +
        s"(target $targetPolls)")

    // restart leg: new arrivals + a fresh runOnce against the SAME ledger
    // (process restart semantics), then an empty poll must discover 0
    produce(targetPolls)
    val restart = graft.convert.AvroToParquetJob.runOnce(
      spark, s"$landing/*/*.avro", out,
      ledgerDir = Some(ledgerDir), ledgerShards = 4)
    if (restart.failed.nonEmpty || restart.discovered != filesPerPoll) {
      ok = false
      println(s"[soak] FAILED: restart poll discovered=" +
        s"${restart.discovered} (want $filesPerPoll) " +
        s"failed=${restart.failed}")
    }
    val empty = graft.convert.AvroToParquetJob.runOnce(
      spark, s"$landing/*/*.avro", out,
      ledgerDir = Some(ledgerDir), ledgerShards = 4)
    if (empty.discovered != 0) {
      ok = false
      println(s"[soak] FAILED: empty poll discovered=${empty.discovered} " +
        "(ledger must dedup the whole history)")
    }

    // exactly-once accounting: rows and distinct payload ids across both
    // folder tables must equal everything produced (envelope fields like
    // uuid are DROPPED by the flat schema — payload.id is the unique key,
    // disjoint across files via idBase; additive generations name-merge)
    val counts = folders.map { folder =>
      val df = spark.read.option("mergeSchema", "true")
        .parquet(s"$out/$folder")
      (df.count(), df.select("id").distinct().count())
    }
    val nOut = counts.map(_._1).sum
    val nIds = counts.map(_._2).sum
    println(s"[soak] produced=$produced read_back=$nOut distinct_ids=$nIds")
    if (nOut != produced || nIds != produced) {
      ok = false
      println(s"[soak] FAILED: exactly-once accounting mismatch")
    }

    // flat-heap criterion: late-window median vs early-window median
    // (first 20 polls excluded as warmup — code cache, broadcast and
    // Spark UI-less session state still ramping)
    val early = median(heapSeries.slice(20, 60).toSeq)
    val late = median(heapSeries.slice(
      math.max(0, heapSeries.size - 40), heapSeries.size).toSeq)
    val ledgerFiles = new java.io.File(ledgerDir).listFiles()
    val nLedger = if (ledgerFiles == null) -1 else ledgerFiles.length
    println(f"[soak] polls=${reports.size} wall_s=$loopS%.0f " +
      f"heap_mb_early_median=$early heap_mb_late_median=$late " +
      f"ledger_entries=$nLedger")
    if (early > 0 && late > early * 13 / 10) {
      ok = false
      println(s"[soak] FAILED: retained heap grew ${late}MB vs ${early}MB " +
        "(>1.3x) — driver-side leak across polls")
    }

    spark.stop()
    println(if (ok) "[soak] RESULT ok" else "[soak] RESULT FAILED")
    if (!ok) sys.exit(1)
  }
}
