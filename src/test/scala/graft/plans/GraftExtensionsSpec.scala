package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayJaccard

/** The Jaccard-prefilter optimizer rule, observed on a session built with
  * `withExtensions(new GraftExtensions)`: the optimized plan of a
  * `jaccard(a,b) >= t` filter contains injected size() bounds, and results
  * are unchanged (the prefilter is a necessary condition of the
  * threshold).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // The suites share one JVM-wide session (getOrCreate ignores
  // withExtensions on an existing session), so install the rule through
  // the public per-session hook — the same Rule object Verify/Bench get
  // via `withExtensions(new GraftExtensions)`.
  private lazy val spark: SparkSession = {
    val s = graft.SparkTestSession.spark
    if (!s.experimental.extraOptimizations.contains(JaccardPrefilterRule)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ JaccardPrefilterRule
    }
    s
  }

  test("single-pass struct kernels are SQL-reachable and agree with the " +
    "per-stat functions (round 16)") {
    val rows = spark.sql("""
      SELECT
        png_decode_stats(png_encode_gray(6, 5, CAST(11 AS BIGINT))) AS ps,
        image_width(png_encode_gray(6, 5, CAST(11 AS BIGINT))) AS w,
        round(png_brightness(png_encode_gray(6, 5, CAST(11 AS BIGINT))), 10) AS br,
        png_resize4(png_encode_gray(6, 5, CAST(11 AS BIGINT))) AS rz
      """).collect().head
    val ps = rows.getStruct(0)
    assert(ps.getInt(0) == rows.getInt(1) && ps.getInt(1) == 5)
    assert(math.abs(ps.getDouble(2) - rows.getDouble(2)) < 1e-9)
    assert(ps.getString(3) == rows.getString(3))
    // WAV: build a 16-bit PCM container in SQL via unhex and compare
    // struct vs per-stat on the same bytes; non-wav bytes null the struct
    // RIFF size = total bytes after the size field (WAVE + fmt + data
    // chunks = 4 + 24 + 14 = 42 = 0x2A); the parser does not validate it
    // today, but the fixture must stay spec-correct (ADVICE r16)
    val wavHex = "52494646" + "2A000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "401F0000" + "803E0000" + "0200" +
      "1000" + "64617461" + "06000000" + "0100" + "FFFF" + "0080"
    val w = spark.sql(s"""
      SELECT wav_pcm_stats(unhex('$wavHex')) AS st,
        wav_pcm_samples(unhex('$wavHex')) AS n,
        wav_pcm_sum_sq(unhex('$wavHex')) AS ss,
        wav_pcm_peak(unhex('$wavHex')) AS pk,
        wav_vad_stats(unhex('$wavHex')) AS vs,
        wav_vad_frames(unhex('$wavHex')) AS nf,
        wav_pcm_stats(CAST('not a wav' AS BINARY)) AS bad
      """).collect().head
    val st = w.getStruct(0)
    assert(st.getLong(0) == w.getLong(1) && st.getLong(0) == 3L)
    assert(st.getLong(1) == w.getLong(2) &&
      st.getLong(1) == 1L + 1L + 32768L * 32768L)
    assert(st.getInt(2) == w.getInt(3) && st.getInt(2) == 32768)
    val vs = w.getStruct(4)
    assert(vs.getLong(0) == w.getLong(5) && vs.getLong(0) == 0L,
      "3 samples < one 160-sample frame")
    assert(w.isNullAt(6), "non-wav bytes must null the struct")
  }

  test("jaccard threshold filters get size-ratio prefilters injected; " +
    "results unchanged") {
    import spark.implicits._
    // file-backed input: literal relations would be folded away by
    // ConvertToLocalRelation before the plan is observable
    val tmp = java.nio.file.Files.createTempDirectory("graft-ext").toFile.getAbsolutePath
    Seq(
      (1L, Seq("a", "b", "c"), Seq("a", "b", "c", "d")),   // j = 0.75
      (2L, Seq("a", "b"), Seq("c", "d")),                  // j = 0
      (3L, Seq("a"), Seq("a", "b", "c", "d", "e", "f", "g", "h", "i")), // sizes 1 vs 9
      (4L, Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")), // j = 1
    ).toDF("id", "x", "y").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
      // sorted inputs (ArrayJaccard contract)
      .select($"id", array_sort($"x").as("x"), array_sort($"y").as("y"))

    val filtered = df
      .withColumn("j", round(ArrayJaccard.arrayJaccard($"x", $"y"), 6))
      .filter($"j" >= 0.5)

    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(optimized.contains("size("), s"prefilter not injected:\n$optimized")

    val ids = filtered.collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L)) // exact answer: the prefilter pruned nothing it shouldn't

    // control: a strict > filter (not matched by the rule) yields the same
    // rows without any injected size() predicates
    val control = df
      .withColumn("j", round(ArrayJaccard.arrayJaccard($"x", $"y"), 6))
      .filter($"j" > 0.499999)
    assert(!control.queryExecution.optimizedPlan.toString.contains("size("))
    assert(control.collect().map(_.getLong(0)).toSet == ids)
  }

  test("structural guard: re-applying the rule injects no duplicate size bounds") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ext2").toFile.getAbsolutePath
    Seq((1L, Seq("a", "b"), Seq("a", "c"))).toDF("id", "x", "y")
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
      .filter(ArrayJaccard.arrayJaccard($"x", $"y") >= 0.5)
    val once = JaccardPrefilterRule(df.queryExecution.analyzed)
    val twice = JaccardPrefilterRule(once)
    def sizeCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      p.foreach(_.expressions.foreach(_.foreach {
        case _: org.apache.spark.sql.catalyst.expressions.Size => n += 1
        case _ => ()
      }))
      n
    }
    // two bounds × two size() operands each
    assert(sizeCount(once) == 4, once.toString)
    assert(sizeCount(twice) == 4, s"rule re-fired on its own output:\n$twice")
  }

  test("rule leaves non-jaccard filters untouched") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v").filter($"k" > 1)
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2))
  }
}
