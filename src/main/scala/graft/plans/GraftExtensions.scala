package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.ArrayJaccardExpr

/** Catalyst optimizer rule: a filter `round(jaccard(a,b), s) >= t` (or
  * `jaccard(a,b) >= t`) with t > 0 implies the cheap necessary condition
  * `size(b) >= t/(2-t)·size(a) && size(a) >= t/(2-t)·size(b)` — Jaccard ≥ t
  * forces |∩| ≥ t·|∪| ≥ t·max(|a|,|b|), and |∩| ≤ min(|a|,|b|), so
  * min/max ≥ t/(2-t) … conservatively we inject the weaker-but-safe bound
  * min ≥ t/2·max (i.e. sizes within a factor 2/t of each other), which the
  * exact Jaccard filter then refines. The injected predicate is evaluated
  * BEFORE the expensive set intersection, pruning most candidate pairs —
  * the optimization we previously hand-wrote into the n-gram query, now
  * applied automatically to ANY Jaccard threshold filter.
  *
  * Registered via [[GraftExtensions]] (`SparkSessionExtensions` — the
  * standard extension-point rung (c) of the custom-operator ladder).
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] {

  private def bound(t: Double): Double = t / 2.0 // safe: min/max >= t/(2-t) >= t/2

  private def prefilter(j: ArrayJaccardExpr, t: Double): Expression = {
    val sa = Size(j.left)
    val sb = Size(j.right)
    val f = Literal(bound(t))
    And(
      GreaterThanOrEqual(
        Cast(sb, org.apache.spark.sql.types.DoubleType),
        Multiply(f, Cast(sa, org.apache.spark.sql.types.DoubleType))),
      GreaterThanOrEqual(
        Cast(sa, org.apache.spark.sql.types.DoubleType),
        Multiply(f, Cast(sb, org.apache.spark.sql.types.DoubleType))))
  }

  /** extract (jaccardExpr, threshold) from `jac >= t` shapes, including a
    * wrapping round(..., s)
    */
  private def matchThreshold(cond: Expression): Option[(ArrayJaccardExpr, Double)] =
    cond match {
      case GreaterThanOrEqual(j: ArrayJaccardExpr, Literal(t: Double, _)) if t > 0 =>
        Some((j, t))
      case GreaterThanOrEqual(Round(j: ArrayJaccardExpr, _, _), Literal(t: Double, _)) if t > 0 =>
        Some((j, t))
      case _ => None
    }

  /** STRUCTURAL re-fire guard (a TreeNodeTag would be lost whenever another
    * fixpoint-batch rule rebuilds the Filter/Join node — e.g. predicate
    * pushdown constructs new Filters — and the rule would then stack
    * duplicate size bounds each iteration): a jaccard conjunct is only
    * augmented if no OTHER conjunct already references `size()` of its
    * operands. Idempotent by construction, so the batch reaches fixpoint.
    */
  private def hasSizeBound(conjuncts: Seq[Expression], j: ArrayJaccardExpr): Boolean = {
    val sl = Size(j.left)
    val sr = Size(j.right)
    conjuncts.exists { c =>
      matchThreshold(c).isEmpty &&
        c.exists { case s: Size => s.semanticEquals(sl) || s.semanticEquals(sr); case _ => false }
    }
  }

  private def augment(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val extra = conjuncts.flatMap(matchThreshold)
      .filterNot { case (j, _) => hasSizeBound(conjuncts, j) }
    if (extra.isEmpty) None
    else Some(And(extra.map { case (j, t) => prefilter(j, t) }.reduce(And(_, _)), cond))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      augment(cond) match {
        case None => f
        case Some(c) => Filter(c, child)
      }
    // the optimizer routinely folds such filters into join conditions —
    // match them there too (And short-circuits, so the cheap size bounds
    // run before the set intersection per candidate pair)
    case j: Join if j.condition.isDefined =>
      augment(j.condition.get) match {
        case None => j
        case Some(c) => j.copy(condition = Some(c))
      }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}

/** Session extensions: install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Besides the optimizer rule, every graft kernel is registered as a SQL
  * function, so the whole library is reachable from plain SQL (and thus
  * JDBC/thrift users, views, and the `sql()` surface):
  *
  * {{{
  * SELECT doc_id FROM docs
  * WHERE array_jaccard(word_shingles(a, 3), word_shingles(b, 3)) >= 0.8
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: n must be an integer literal, got $other")
  }

  private def register(
      e: SparkSessionExtensions, name: String, usage: String,
      arity: Int)(builder: Seq[Expression] => Expression): Unit = {
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s)")
        builder(args)
      }))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => JaccardPrefilterRule)

    register(e, "array_jaccard",
      "jaccard similarity of two SORTED string arrays", 2) {
      a => ArrayJaccardExpr(a(0), a(1))
    }
    register(e, "word_shingles",
      "sorted distinct n-word shingles of a string", 2) {
      a => graft.functions.WordShinglesExpr(a(0), intArg(a(1), "word_shingles"))
    }
    register(e, "char_grams",
      "sorted distinct character n-grams of a string", 2) {
      a => graft.functions.CharGramsExpr(a(0), intArg(a(1), "char_grams"))
    }
    register(e, "simhash64", "64-bit simhash of a string array", 1) {
      a => graft.functions.SimHash64Expr(a(0))
    }
    register(e, "rolling_hash", "polynomial rolling hash of a string", 1) {
      a => graft.functions.RollingHash(a(0))
    }
    register(e, "winnow_stats",
      "winnowing fingerprint statistics (k=5, w=4) of a string", 1) {
      a => graft.functions.WinnowStats(a(0))
    }
    register(e, "word_shingle_hashes",
      "sorted distinct 64-bit hash ids of n-word shingles", 2) {
      a => graft.functions.WordShingleHashesExpr(
        a(0), intArg(a(1), "word_shingle_hashes"))
    }
    register(e, "word_window_hashes",
      "hash id of every overlapping n-word window, in position order", 2) {
      a => graft.functions.WordWindowHashesExpr(
        a(0), intArg(a(1), "word_window_hashes"))
    }
    register(e, "char_gram_hashes",
      "sorted distinct 64-bit hash ids of character n-grams", 2) {
      a => graft.functions.CharGramHashesExpr(
        a(0), intArg(a(1), "char_gram_hashes"))
    }
    register(e, "sorted_overlap",
      "count of common elements of two ASC-sorted distinct bigint arrays", 2) {
      a => graft.functions.SortedOverlapCountExpr(a(0), a(1))
    }
    register(e, "url_canonical",
      "canonical dedup key of a URL (case, ports, tracking params, " +
        "slashes, fragments)", 1) {
      a => graft.functions.UrlCanonicalExpr(a(0))
    }
    register(e, "canonical_json",
      "canonical sorted-keys compact JSON of any value", 1) {
      a => graft.functions.CanonicalJsonExpr(a(0))
    }
    register(e, "avro_decimal",
      "numeric to DECIMAL(38,9), HALF_EVEN, null on overflow", 1) {
      a => graft.functions.AvroDecimalNumeric(a(0))
    }
    register(e, "avro_decimal_bytes",
      "scale-30 unscaled bytes to DECIMAL(38,9), zero on error", 1) {
      a => graft.functions.AvroDecimalBytes(a(0))
    }
    register(e, "array_dot",
      "sequential-fold dot product of two double arrays", 2) {
      a => graft.functions.ArrayDot(a(0), a(1))
    }
    register(e, "shingle_tvf",
      "generator: one row per n-word shingle", 2) {
      a => graft.functions.ShingleGenerator(a(0), intArg(a(1), "shingle_tvf"))
    }

    // multimodal decode kernels — the media family is SQL-reachable too
    Seq("format", "width", "height").foreach { attr =>
      register(e, s"image_$attr",
        s"$attr parsed from PNG/JPEG/GIF header bytes, null if not an image", 1) {
        a => graft.functions.ImageHeaderAttr(a(0), attr)
      }
    }
    Seq("channels", "sample_rate", "duration_ms",
      "pcm_samples", "pcm_sum_sq", "pcm_peak",
      "vad_frames", "vad_active", "vad_run").foreach { attr =>
      register(e, s"wav_$attr",
        s"$attr parsed from WAV RIFF chunks, null if not a WAV", 1) {
        a => graft.functions.WavHeaderAttr(a(0), attr)
      }
    }
    Seq("brand", "timescale", "duration_ms", "mdat_offset", "mdat_size")
      .foreach { attr =>
        register(e, s"mp4_$attr",
          s"$attr parsed from the MP4 box tree, null if not ISO BMFF", 1) {
          a => graft.functions.Mp4HeaderAttr(a(0), attr)
        }
      }
    register(e, "png_encode_gray",
      "spec-valid grayscale PNG of the deterministic pixel pattern", 3) {
      a => graft.functions.PngEncodeGray(a(0), a(1), a(2))
    }
    register(e, "png_brightness",
      "mean gray of the DECODED pixels (zlib inflate + filter recon)", 1) {
      a => graft.functions.PngDecodeStat(a(0), "brightness")
    }
    register(e, "png_resize4",
      "nearest-neighbor 4x4 downsample of the decoded pixels, CSV", 1) {
      a => graft.functions.PngDecodeStat(a(0), "resize4")
    }
    register(e, "png_ahash",
      "64-bit average-hash of the decoded pixels (8x8 downsample), hex", 1) {
      a => graft.functions.PngDecodeStat(a(0), "ahash")
    }
    // single-pass struct variants (round 16): several readouts of the
    // same payload for ONE decode/fold — the per-stat functions above
    // re-run the whole pass per call
    register(e, "png_decode_stats",
      "struct<width,height,brightness,resized> from ONE png decode", 1) {
      a => graft.functions.PngDecodeStats(a(0))
    }
    register(e, "wav_pcm_stats",
      "struct<n_samples,sum_sq,peak> from ONE 16-bit PCM fold", 1) {
      a => graft.functions.WavPcmStats(a(0))
    }
    register(e, "wav_vad_stats",
      "struct<n_frames,n_active,longest_run> from ONE VAD energy fold", 1) {
      a => graft.functions.WavVadStats(a(0))
    }
    register(e, "tar_entries",
      "checksum-verified ustar members of a tar shard as " +
        "array<struct<name, size, byte_sum>>", 1) {
      a => graft.functions.TarEntriesExpr(a(0))
    }
  }
}
