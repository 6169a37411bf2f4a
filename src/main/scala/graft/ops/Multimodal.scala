package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-wise batch transforms.
  *
  * The actual media codecs are NOT in this container, so the decoder is a
  * deterministic STUB ([[StubDecoder]]) behind a narrow interface — the
  * Spark-side plumbing (schema, batching, partition-wise execution, typed
  * output) is real and tested. Swapping in a real decoder is a one-class
  * change.
  *
  * Scale posture: decode runs inside `mapPartitions` (one JVM-side batch
  * per partition, no per-row UDF serialization), the binary column is
  * pruned away right after feature extraction, and nothing ever collects.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload. */
  final case class MediaMeta(
      byteLen: Long,
      width: Int,
      height: Int,
      format: String,
      frames: Seq[Long])

  /** The decoder seam. Implementations MUST be pure and thread-safe. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode: "header" = first two bytes as width/height,
    * "format" from the length mod; "frames" = 4 sample offsets. A real
    * implementation would parse JPEG/PNG/WAV headers here.
    */
  object StubDecoder extends Decoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val len = bytes.length.toLong
      val w = if (bytes.length > 0) bytes(0) & 0xff else 0
      val h = if (bytes.length > 1) bytes(1) & 0xff else 0
      val fmt = (len % 3) match {
        case 0 => "img"; case 1 => "audio"; case _ => "video"
      }
      val frames = (0L until 4L).map(i => i * (len / 4))
      MediaMeta(len, w, h, fmt, frames)
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("frames", ArrayType(LongType, containsNull = false)),
  ))

  /** Partition-wise decode: input DF must have an `id` column and a binary
    * `payload` column; output is (id, byte_len, width, height, format,
    * frames) with the binary column dropped (pruned before any shuffle).
    */
  def extractMeta(df: DataFrame, decoder: Decoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.select(col("id"), col("payload")).schema
    val outSchema = StructType(StructField("id", inSchema("id").dataType) +:
      metaSchema.fields.toSeq)
    val rdd = df.select(col("id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val m = decoder.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.get(0), m.byteLen, m.width, m.height, m.format, m.frames)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Oracle-checkable declarative variant of the stub decode over the
    * documents table (binary = UTF-8 bytes of the text): identical
    * arithmetic to [[StubDecoder]] for ASCII payloads, expressed in
    * engine-portable SQL functions.
    */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("width", ascii(substring(col("text"), 1, 1)))
      .withColumn("height", ascii(substring(col("text"), 2, 1)))
      .withColumn("format",
        when(col("byte_len") % 3 === 0, "img")
          .when(col("byte_len") % 3 === 1, "audio")
          .otherwise("video"))
      // CSV-serialized, not ARRAY<LONG>: the driver's pandas compare
      // lexsorts every output column and numpy arrays are unhashable there.
      .withColumn("frames",
        array_join(transform(sequence(lit(0L), lit(3L)),
          i => i * (col("byte_len") / lit(4L)).cast("long")), ","))
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        col("format"), col("frames"))
      .orderBy(col("doc_id"))

  val qMultimodalMetaOracle: String =
    """SELECT doc_id,
      octet_length(encode(text))::BIGINT AS byte_len,
      ascii(substr(text, 1, 1)) AS width,
      ascii(substr(text, 2, 1)) AS height,
      CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'img'
           WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
           ELSE 'video' END AS format,
      array_to_string(
        [i * (octet_length(encode(text))::BIGINT // 4) for i in range(0, 4)],
        ',') AS frames
      FROM documents ORDER BY doc_id"""

  /** Frame sampling: one row per sampled "frame" (fixed-offset byte
    * window of the payload), the exploded shape a video pipeline feeds to
    * per-frame feature extraction. Real plumbing (binary slicing,
    * explode, per-frame fingerprints); the decode itself remains the
    * deterministic stub.
    */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .select(col("doc_id"), col("payload"), col("byte_len"),
        posexplode(transform(sequence(lit(0L), lit(3L)),
          i => i * (col("byte_len") / lit(4L)).cast("long")))
          .as(Seq("frame_idx", "offset")))
      .withColumn("frame",
        substring(col("payload"), (col("offset") + 1).cast("int"), lit(16)))
      .select(col("doc_id"), col("frame_idx"), col("offset"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** DuckDB's substring does not operate on BLOBs; the docs are ASCII so
    * byte offsets equal character offsets and the oracle slices the text —
    * byte-identical to Spark's binary slice.
    */
  val qMultimodalFramesOracle: String =
    """WITH d AS (SELECT doc_id, text,
        octet_length(encode(text))::BIGINT byte_len FROM documents),
      f AS (SELECT doc_id, text, byte_len,
        unnest(range(0, 4)) frame_idx,
        unnest([i * (byte_len // 4) for i in range(0, 4)]) AS off
        FROM d)
      SELECT doc_id, frame_idx::INT AS frame_idx, off AS offset,
        octet_length(encode(substr(text, (off + 1)::INT, 16)))::BIGINT AS frame_bytes,
        md5(substr(text, (off + 1)::INT, 16)) AS frame_md5
      FROM f ORDER BY doc_id, frame_idx"""

  /** Resize + feature-extract plumbing: the stub "resize" takes a fixed
    * grid of 16 stride samples over the payload bytes (a real decoder
    * would bilinear-sample pixels — identical Spark shape: binary in,
    * fixed-length vector out), and the "feature" is the mean sample value
    * (a 1-d brightness). Output is CSV-serialized for the gate compare.
    */
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .filter(col("byte_len") >= 16)
      .withColumn("samples",
        transform(sequence(lit(0L), lit(15L)),
          i => ascii(substring(col("text"),
            ((i * col("byte_len")) / lit(16L)).cast("int") + 1, lit(1))).cast("long")))
      .select(
        col("doc_id"),
        array_join(col("samples"), ",").as("resized"),
        round(aggregate(col("samples"), lit(0.0), (a, x) => a + x) / lit(16.0), 4)
          .as("brightness"))
      .orderBy(col("doc_id"))

  /** Docs are ASCII, so byte offsets equal character offsets in the
    * oracle's text slicing (same convention as the frames oracle).
    */
  val qMultimodalResizeOracle: String =
    """WITH d AS (SELECT doc_id, text, octet_length(encode(text))::BIGINT n
        FROM documents WHERE octet_length(encode(text)) >= 16),
      s AS (SELECT doc_id,
        [ascii(substr(text, ((i * n) // 16)::INT + 1, 1))::BIGINT
          for i in range(0, 16)] AS samples FROM d)
      SELECT doc_id, array_to_string(samples, ',') AS resized,
        round(list_sum(samples) / 16.0, 4) AS brightness
      FROM s ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _),
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaOracle,
    "q_multimodal_frames" -> qMultimodalFramesOracle,
    "q_multimodal_resize" -> qMultimodalResizeOracle,
  )
}
