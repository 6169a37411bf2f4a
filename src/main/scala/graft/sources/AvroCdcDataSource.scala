package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.avro._

/** DataSource V2 reader for CDC Avro container files, exposed as
  * `spark.read.format("cdc-avro").load(pathOrGlob)`.
  *
  * The scan yields the REFERENCE's flattened shape directly: the fixed
  * `source_metadata` struct plus typed `payload.*` columns (schema derived
  * with [[AvroSchemaConverter]]'s exact union rules from the first file's
  * writer schema), plus an `_input_path` provenance column.
  *
  * Spark-native properties the reference lacks:
  *  - one input partition per file → embarrassingly parallel scan;
  *  - REAL column pruning ([[SupportsPushDownRequiredColumns]]): unneeded
  *    payload fields are never converted (the reference materializes every
  *    file fully, twice);
  *  - streaming per-record iteration — no whole-file materialization.
  *
  * Files whose writer schema differs from the inferred one are still read:
  * fields are matched by name, extras dropped, missing ones null — the
  * per-schema-group orchestration (and the all-string fallback path) lives
  * in [[graft.convert.AvroToParquetJob]], which remains the faithful
  * conversion entry point.
  */
class AvroCdcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-avro"

  override def supportsExternalMetadata(): Boolean = false

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(_.split(","))
    raw.map(_.trim).filter(_.nonEmpty)
  }

  private def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    paths(options).flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matches = fs.globStatus(hp)
      if (matches == null) Seq.empty
      else matches.filter(_.isFile).map(_.getPath.toString)
    }.sorted
  }

  private def readWriterSchema(file: String): String = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(file)
    val in = new DataFileStream[GenericRecord](
      p.getFileSystem(conf).open(p), graft.avro.AvroCdcReader.newDatumReader())
    try in.getSchema.toString finally in.close()
  }

  /** The flat schema the scan exposes. Default: the first file's (cheap —
    * one header read). With `mergeSchema=true`: header-read every file,
    * derive each flat schema, and union the payload columns by name —
    * conflicting types collapse to string (the reference's universal
    * fallback type), giving one well-typed view over heterogeneous CDC
    * file generations. Readers coerce per-file values to the merged
    * column types.
    */
  private[sources] def flatSchemaFor(options: CaseInsensitiveStringMap): AvroSchemaConverter.FlatSchema = {
    // explicit writer schema: no file access at all — REQUIRED for a
    // streaming cold start where the glob matches zero files yet (the
    // reference's MatchContinuously starts on an empty landing zone too)
    Option(options.get("avroSchema")).map(_.trim).filter(_.nonEmpty).foreach {
      json => return AvroSchemaConverter.deriveFlatSchema(json)
    }
    val files = resolvePaths(options)
    require(files.nonEmpty,
      s"cdc-avro: no files match ${paths(options)} " +
        "(pass the 'avroSchema' option to start on an empty directory)")
    // a corrupt file must not block schema inference: skip unreadable
    // headers (the scan isolates them again at read time)
    def tryRead(f: String): Option[String] =
      try Some(readWriterSchema(f)) catch { case _: Exception => None }
    if (!options.getBoolean("mergeSchema", false)) {
      val schemaJson = files.view.flatMap(tryRead(_)).headOption.getOrElse(
        throw new IllegalArgumentException(
          s"cdc-avro: no readable Avro file among ${files.size} matches"))
      AvroSchemaConverter.deriveFlatSchema(schemaJson)
    } else {
      val flats = files.flatMap(tryRead(_))
        .map(AvroSchemaConverter.deriveFlatSchema(_))
      require(flats.nonEmpty,
        s"cdc-avro: no readable Avro file among ${files.size} matches")
      AvroCdcDataSource.mergeFlatSchemas(flats)
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroCdcDataSource.sparkSchema(flatSchemaFor(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new AvroCdcTable(paths(options), resolvePaths(options), schema,
      flatSchemaFor(options))
  }
}

object AvroCdcDataSource {
  val InputPathCol = "_input_path"

  private[sources] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[AvroCdcDataSource])

  private[sources] def asNullable(dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  def sparkSchema(flat: AvroSchemaConverter.FlatSchema): StructType = {
    val relaxed = asNullable(flat.toSpark).asInstanceOf[StructType]
    StructType(relaxed.fields :+
      StructField(InputPathCol, org.apache.spark.sql.types.StringType, nullable = false))
  }

  /** Union of payload columns by name, first-seen order; a name whose type
    * differs across file generations becomes string.
    */
  def mergeFlatSchemas(flats: Seq[AvroSchemaConverter.FlatSchema]): AvroSchemaConverter.FlatSchema = {
    import graft.avro.AvroSparkType._
    val order = scala.collection.mutable.LinkedHashMap[String, TField]()
    flats.foreach { f =>
      f.payloadFields.foreach { tf =>
        order.get(tf.name) match {
          case None => order(tf.name) = tf
          case Some(prev) if prev.tpe == tf.tpe =>
            if (tf.nullable && !prev.nullable)
              order(tf.name) = prev.copy(nullable = true)
          case Some(prev) if prev.tpe != TString =>
            order(tf.name) = TField(tf.name, TString, nullable = true)
          case _ => ()
        }
      }
    }
    AvroSchemaConverter.FlatSchema(order.values.toSeq)
  }
}

class AvroCdcTable(
    globs: Seq[String], files: Seq[String], tableSchema: StructType,
    tableFlat: AvroSchemaConverter.FlatSchema,
    defaultIgnoreCorrupt: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"cdc-avro(${files.size} files)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroCdcScanBuilder(globs, files, tableSchema, tableFlat,
      options.getBoolean("ignoreCorruptFiles", defaultIgnoreCorrupt))
}

class AvroCdcScanBuilder(
    globs: Seq[String], files: Seq[String], fullSchema: StructType,
    tableFlat: AvroSchemaConverter.FlatSchema, ignoreCorrupt: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private var required: StructType = fullSchema
  private var prunedFiles: Seq[String] = files
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve our column order; accept any subset
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep.contains(f.name)))
  }

  /** FILE pruning: predicates on the `_input_path` provenance column are
    * evaluated against the file list at PLANNING time — whole files are
    * skipped, the scan never opens them (the DSv2 analogue of partition
    * pruning; at a 100 TB landing zone this is the difference between
    * reading one folder and reading everything). All other filters are
    * left to Spark (rows must be decoded to evaluate them anyway).
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    val Col = AvroCdcDataSource.InputPathCol
    def prune(f: Filter): Option[String => Boolean] = f match {
      case EqualTo(Col, v: String) => Some(_ == v)
      case StringStartsWith(Col, v: String) => Some(_.startsWith(v))
      case StringEndsWith(Col, v: String) => Some(_.endsWith(v))
      case StringContains(Col, v: String) => Some(_.contains(v))
      case In(Col, vs) =>
        val set = vs.collect { case s: String => s }.toSet
        Some(set.contains)
      case _ => None
    }
    val (handled, rest) = filters.partition(f => prune(f).isDefined)
    handled.foreach(f => prunedFiles = prunedFiles.filter(prune(f).get))
    pushed = handled
    rest // residual filters Spark must still evaluate
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  /** Per-partition row cap: a global LIMIT n needs at most n rows from
    * each file, so each reader stops decoding after n rows.
    */
  override def pushLimit(n: Int): Boolean = {
    limit = n
    false // partial: Spark still applies the global limit
  }

  override def build(): Scan =
    new AvroCdcScan(globs, prunedFiles, required, tableFlat, ignoreCorrupt, limit)
}

class AvroCdcScan(
    globs: Seq[String], files: Seq[String], required: StructType,
    tableFlat: AvroSchemaConverter.FlatSchema, ignoreCorrupt: Boolean = false,
    limit: Int = -1)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"cdc-avro scan, ${files.size} files, columns=[${required.fieldNames.mkString(",")}]"

  /** One partition per BYTE RANGE, not per file (same sync-marker split
    * contract and sizing formula as the conversion path,
    * [[graft.avro.AvroCdcReader.planSplits]]): a few giant containers fan
    * out across the cluster; small files stay one partition each.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.avro.AvroCdcReader
      .planSplits(spark, files, spark.sparkContext.hadoopConfiguration)
      .map(s => AvroCdcInputPartition(s.path, s.start, s.end): InputPartition)
      .toArray
  }

  /** Compressed on-disk bytes as the size estimate: lets Spark's join
    * planning auto-broadcast small CDC tables (e.g. catalog dimension
    * folders) instead of shuffling both sides.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val totalBytes: Long = {
      val conf = org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration
      files.map { f =>
        val p = new Path(f)
        try p.getFileSystem(conf).getFileStatus(p).getLen
        catch { case _: Exception => 0L }
      }.sum
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(totalBytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  private def serializableConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def createReaderFactory(): PartitionReaderFactory =
    AvroCdcReaderFactory(required, tableFlat, serializableConf, ignoreCorrupt, limit)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroCdcMicroBatchStream(globs, required, tableFlat, serializableConf,
      ignoreCorrupt)
}

/** `end < 0` means "the whole file" (the micro-batch stream plans per-file
  * partitions; the batch scan plans sync-marker byte ranges).
  */
case class AvroCdcInputPartition(path: String, start: Long = 0L, end: Long = -1L)
    extends InputPartition

case class AvroCdcReaderFactory(
    required: StructType,
    tableFlat: AvroSchemaConverter.FlatSchema,
    conf: SerializableConfiguration,
    ignoreCorrupt: Boolean = false,
    limit: Int = -1) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroCdcInputPartition]
    if (!ignoreCorrupt)
      new AvroCdcPartitionReader(p.path, required, tableFlat, conf,
        limit = limit, start = p.start, end = p.end)
    else
      try new AvroCdcPartitionReader(p.path, required, tableFlat, conf,
        ignoreCorrupt = true, limit = limit, start = p.start, end = p.end)
      catch {
        case _: Exception => new EmptyPartitionReader
      }
  }
}

/** ignoreCorruptFiles=true: an unreadable file contributes zero rows. */
class EmptyPartitionReader extends PartitionReader[InternalRow] {
  override def next(): Boolean = false
  override def get(): InternalRow =
    throw new IllegalStateException("empty reader")
  override def close(): Unit = ()
}

/** Streams one Avro container file as flattened InternalRows, converting
  * ONLY the columns the scan requires. Values are coerced to the TABLE's
  * merged column types: a column whose per-file type matches converts
  * natively; a column merged to string (type conflict across file
  * generations) is stringified; anything else incompatible yields null.
  */
class AvroCdcPartitionReader(
    path: String,
    required: StructType,
    tableFlat: AvroSchemaConverter.FlatSchema,
    conf: SerializableConfiguration,
    ignoreCorrupt: Boolean = false,
    limit: Int = -1,
    start: Long = 0L,
    end: Long = -1L) extends PartitionReader[InternalRow] {

  private var emitted = 0L

  private val hPath = new Path(path)
  // seekable reader so a byte-range partition can sync to its first owned
  // block; `sync(0)` lands on the header's trailing sync marker, i.e. the
  // first block, so a whole-file read goes through the same path
  private val fsIn = new org.apache.avro.mapred.FsInput(hPath, conf.value)
  private val fileLen = fsIn.length()
  private val stream = new org.apache.avro.file.DataFileReader[GenericRecord](
    fsIn, graft.avro.AvroCdcReader.newDatumReader())
  stream.sync(start)
  // whole-file sentinel stays clear of Long.MaxValue: DataFileReader
  // .pastSync computes `position + SYNC_SIZE`, which overflows negative at
  // MaxValue and would mark every block past-sync immediately
  private val endPos: Long = if (end < 0) Long.MaxValue - 1024L else end

  // per-file flat schema from ITS writer schema (name-matched to `required`)
  private val fileFlat = AvroSchemaConverter.deriveFlatSchema(stream.getSchema.toString)
  private val tableByName = tableFlat.payloadFields.map(f => f.name -> f).toMap
  private val fieldByName = fileFlat.payloadFields.map { f =>
    // type to convert WITH: the file's own (unit-aware) type when it
    // matches the table column; TString when the table merged to string;
    // None (→ null) on any other mismatch
    val target = tableByName.get(f.name) match {
      case Some(t) if t.tpe == f.tpe => Some(f.tpe)
      case Some(t) if t.tpe == graft.avro.AvroSparkType.TString =>
        Some(graft.avro.AvroSparkType.TString)
      case Some(_) => None
      case None => Some(f.tpe) // single-schema mode: table == file
    }
    f.name -> (f, target)
  }.toMap

  private val serializer: ExpressionEncoder.Serializer[Row] = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(required))
    enc.createSerializer()
  }

  private var current: InternalRow = _

  /** A header that parses does not guarantee clean data blocks: with
    * ignoreCorruptFiles set, a decode failure mid-file treats the REST of
    * the file as exhausted (rows already emitted stand), mirroring Spark's
    * own ignoreCorruptFiles semantics for its built-in file sources.
    */
  override def next(): Boolean =
    if (!ignoreCorrupt) nextUnsafe()
    else
      try nextUnsafe()
      catch {
        case e: Exception =>
          AvroCdcDataSource.log.warn(
            s"cdc-avro: corrupt data block in $path, skipping rest of file: $e")
          false
      }

  private def nextUnsafe(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false // pushed-down LIMIT
    if (!stream.hasNext) {
      // TRUNCATION GUARD (same contract as AvroCdcReader.readRange):
      // avro-java's hasNext SWALLOWS the EOF of a cut-short final block
      // and reports a clean end-of-stream — without this check a
      // truncated container would silently drop its tail in the DSv2
      // scan and the streaming source. A clean end of a well-formed
      // container leaves the read position exactly at the end-of-file
      // sync boundary; the partition owning the cut block sees
      // previousSync at the last complete block instead and fails
      // loudly (ignoreCorruptFiles routes the throw into the documented
      // skip-rest-of-file path). The condition is checked HERE, on the
      // single hasNext result that ended the stream — hasNext is not
      // idempotent after the swallow and may flip back to true.
      if (stream.previousSync() != fileLen)
        throw new java.io.EOFException(
          s"truncated Avro container: $path ends mid-block at byte " +
            s"$fileLen (last complete block boundary " +
            s"${stream.previousSync()})")
      return false
    }
    if (stream.pastSync(endPos)) return false
    emitted += 1
    val record = stream.next()
    val payload = record.getSchema.getField("payload") match {
      case null => null
      case _ => record.get("payload") match {
        case r: GenericRecord => r
        case _ => null
      }
    }
    val values: Seq[Any] = required.fields.toSeq.map { f =>
      f.name match {
        case AvroCdcDataSource.InputPathCol => path
        case "source_metadata" =>
          val sm = record.getSchema.getField("source_metadata") match {
            case null => null
            case _ => record.get("source_metadata") match {
              case r: GenericRecord => r
              case _ => null
            }
          }
          AvroValueConverter.convertSourceMetadata(sm)
        case name =>
          fieldByName.get(name) match {
            case Some((_, Some(targetType))) =>
              val v =
                if (payload == null || payload.getSchema.getField(name) == null) null
                else payload.get(name)
              AvroValueConverter.convert(v, targetType, ConvertMode.Standard)
            case Some((_, None)) => null // type conflict, not merged to string
            case None => null // column absent in this file's schema
          }
      }
    }
    current = serializer(Row.fromSeq(values)).copy()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
