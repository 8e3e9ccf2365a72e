package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for Avro object-container files, built directly on the
  * `avro` core jars (the `spark-avro` module is not on this classpath —
  * this is a from-scratch integration, not a wrapper).
  *
  * Role in the engine: Avro is the INGEST/interchange format — the wire
  * format of Kafka topics, CDC streams and cross-language landing zones.
  * The 100 TB pattern is avro in → columnar (parquet/ORC) out; analytic
  * storage stays columnar (see [[ProductSink.writeOrc]] notes). What
  * makes the source scale-correct:
  *
  *  - **Splittable reads.** Avro blocks are delimited by 16-byte sync
  *    markers, so one large file fans out across executors: each input
  *    partition seeks to the first sync ≥ its start offset
  *    (`DataFileReader.sync`) and reads until `pastSync(end)` — the same
  *    split contract as the classic Hadoop input format, re-expressed as
  *    a V2 `InputPartition` per (file, start, length) slice of
  *    `spark.sql.files.maxPartitionBytes`.
  *  - **Column pruning that actually skips bytes.** Pruned columns are
  *    dropped from the READER schema; Avro schema resolution then
  *    `skip()`s their bytes in the decoder instead of materializing them
  *    — a real I/O win even in a row-major format (long text/binary
  *    fields cost ~nothing when unprojected). Asserted in PlanSpec-style
  *    tests via the scan's `readSchema`.
  *  - **No filter pushdown** — a row format has no per-block stats;
  *    filters stay in Spark. This is exactly why the sink is for
  *    interchange, not analytics.
  *
  * Write path: a full V2 `BatchWrite` — per-task container files named
  * `part-<partition>-<task>.avro` written as `.tmp` and renamed on task
  * commit (the commit coordinator guarantees one winner per partition),
  * `_SUCCESS` on job commit, `.tmp` cleanup on abort. Overwrite mode
  * truncates via [[SupportsTruncate]]. Directory partitioning
  * (`partitionBy`) is refused by name: partition-pruned layouts belong
  * to the columnar formats.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-avro").load(dir)
  *   df.write.format("graft-avro").option("compression", "snappy")
  *     .mode("overwrite").save(dir)
  * }}}
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  /** True so DataFrameWriter passes the dataframe schema straight in —
    * a write to a fresh directory must not require inference. */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = new Configuration()
    val files = AvroDataSource.listAvroFiles(options, conf)
    require(files.nonEmpty,
      "graft-avro: no .avro files under " + AvroDataSource.paths(options)
        .mkString(", ") + " (pass a schema or write first)")
    // Header-only open of ONE file — Avro is self-describing; the first
    // file's writer schema is the table schema (schema drift across files
    // resolves per-file through Avro schema resolution at read time).
    val in = new FsInput(files.head.getPath, conf)
    try {
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try AvroConv.toCatalyst(r.getSchema).asInstanceOf[StructType]
      finally r.close()
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitioning.isEmpty,
      "graft-avro: directory partitioning (partitionBy) is not supported — " +
        "use parquet/ORC for partition-pruned layouts; avro is the " +
        "interchange format")
    new AvroTable(schema, new CaseInsensitiveStringMap(properties))
  }
}

object AvroDataSource {
  private[sources] def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
      require(node != null && node.isArray,
        s"graft-avro: 'paths' option is not a JSON array: $js")
      (0 until node.size()).map(i => node.get(i).asText()).filter(_.nonEmpty)
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "graft-avro needs load(path, ...)")
    all
  }

  /** Recursive *.avro listing through the Hadoop FS API (so hdfs:// and
    * object stores work identically to local paths), sorted for
    * deterministic partition numbering. Deliberately `listStatus`, NOT
    * `listFiles(recursive)`: located statuses eagerly load permissions
    * (a shell exec per file on the local FS) and CRASH when a
    * concurrent producer renames its `.tmp` away mid-iteration — the
    * exact race a live landing zone exercises every trigger. Plain
    * statuses are lazy and the name filter drops in-flight temp files
    * before anything touches them. */
  private[sources] def listAvroFiles(options: CaseInsensitiveStringMap,
      conf: Configuration): Seq[FileStatus] =
    paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      def rec(dir: Path): Seq[FileStatus] =
        fs.listStatus(dir).toSeq.flatMap { st =>
          if (st.isDirectory) rec(st.getPath)
          else if (st.getPath.getName.endsWith(".avro")) Seq(st)
          else Seq.empty
        }
      if (!fs.exists(path)) Seq.empty else rec(path)
    }.sortBy(_.getPath.toString)
}

class AvroTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"graft-avro(${AvroDataSource.paths(options).mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, o)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info)
}

// ------------------------------------------------------------------- read

class AvroScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(required, options)
}

/** One byte-range slice of one container file. `start == 0` slices begin
  * at the header's trailing sync; others seek forward to the next sync. */
case class AvroSlicePartition(file: String, start: Long, length: Long)
  extends InputPartition

class AvroScan(required: StructType, options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro columns [${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val files = AvroDataSource.listAvroFiles(options, conf)
    // Runs on the driver: SQLConf is in scope. An explicit option wins
    // (tests use it to force multi-split reads of small files).
    val maxBytes = Option(options.get("maxpartitionbytes")).map(_.toLong)
      .getOrElse(SQLConf.get.filesMaxPartitionBytes)
    require(maxBytes > 0, "graft-avro: maxpartitionbytes must be > 0")
    files.flatMap { f =>
      val n = math.max(1L, (f.getLen + maxBytes - 1) / maxBytes)
      (0L until n).map { i =>
        val start = i * maxBytes
        AvroSlicePartition(f.getPath.toString, start,
          math.min(maxBytes, f.getLen - start)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(required, options, checkpointLocation)
}

/** Streaming ingestion from an Avro landing zone —
  * `spark.readStream.format("graft-avro").load(dir)`: each trigger
  * discovers files not yet seen and serves them as the next
  * micro-batch. The landing contract: files are IMMUTABLE once visible
  * (writers write `.tmp` + rename — exactly what [[AvroDataWriter]]
  * and every sane landing producer do).
  *
  * Exactly-once across restarts comes from a tiny versioned FILE LOG
  * under the checkpoint directory: each `latestOffset` that finds new
  * files commits one log entry (`files/N`, atomic rename) listing
  * them; the offset is just the log version, and
  * `planInputPartitions(start, end)` replays log entries
  * (start, end] — so a restarted query re-plans exactly the files the
  * committed offsets covered, never re-discovering by listing (which
  * could shift as more files land). The log grows one small file per
  * non-empty trigger; a retention pass can truncate entries older
  * than the last committed offset.
  *
  * No admission control (maxFilesPerTrigger) — each batch takes every
  * newly-landed file; Spark's own trigger pacing bounds batch
  * frequency. */
class AvroMicroBatchStream(required: StructType,
    options: CaseInsensitiveStringMap, checkpointLocation: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val conf = new Configuration()
  private val logDir = new Path(checkpointLocation, "graft-avro-files")
  private val f = logDir.getFileSystem(conf)
  f.mkdirs(logDir)

  private def logVersions: Seq[Int] =
    f.listStatus(logDir).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).sorted.toSeq

  private def readEntry(v: Int): Seq[String] = {
    val in = f.open(new Path(logDir, v.toString))
    try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq
      .filter(_.nonEmpty)
    finally in.close()
  }

  case class AvroOffset(version: Int) extends Offset {
    override def json(): String = s"""{"version": $version}"""
  }

  override def initialOffset(): Offset = AvroOffset(0)

  override def deserializeOffset(json: String): Offset =
    AvroOffset(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("version").asInt())

  override def latestOffset(): Offset = {
    val versions = logVersions
    val seen = versions.flatMap(readEntry).toSet
    val now = AvroDataSource.listAvroFiles(options, conf)
      .map(_.getPath.toString).filterNot(seen)
    if (now.isEmpty) AvroOffset(versions.lastOption.getOrElse(0))
    else {
      val v = versions.lastOption.getOrElse(0) + 1
      val tmp = new Path(logDir, s"$v.tmp")
      val out = f.create(tmp, true)
      out.write(now.sorted.mkString("\n").getBytes("UTF-8"))
      out.close()
      if (!f.rename(tmp, new Path(logDir, v.toString)))
        throw new java.io.IOException(s"avro stream log commit failed: $v")
      AvroOffset(v)
    }
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[AvroOffset].version
    val e = end.asInstanceOf[AvroOffset].version
    ((s + 1) to e).flatMap(readEntry).map { p =>
      val len = f.getFileStatus(new Path(p)).getLen
      AvroSlicePartition(p, 0, len): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[AvroSlicePartition]
    new PartitionReader[InternalRow] {
      private val conf = new Configuration()
      private val in = new FsInput(new Path(slice.file), conf)
      private val datumReader = new GenericDatumReader[GenericRecord]()
      private val reader = DataFileReader.openReader(in, datumReader)
      // Reader-schema pruning AND evolution: the reader schema carries
      // exactly the REQUIRED fields — present ones keep this file's
      // writer field schema (resolution skips the rest byte-wise);
      // fields this file predates become nullable-with-null-default so
      // Avro resolution fills them with null (the evolution contract
      // the writer encodes by defaulting every nullable field).
      private val writerSchema = reader.getSchema
      private val readerSchema = {
        val fields = required.fields.toSeq.map { f =>
          writerSchema.getField(f.name) match {
            case null =>
              require(f.nullable, s"graft-avro: non-nullable column " +
                s"${f.name} is absent from ${slice.file}'s schema — " +
                "only nullable columns can be added by evolution")
              new Schema.Field(f.name,
                AvroConv.toAvro(f.dataType, f.name, nullable = true,
                  writerSchema.getNamespace),
                null, Schema.Field.NULL_DEFAULT_VALUE)
            case wf => new Schema.Field(wf.name(), wf.schema(), wf.doc(),
              wf.defaultVal())
          }
        }
        Schema.createRecord(writerSchema.getName, writerSchema.getDoc,
          writerSchema.getNamespace, false, fields.asJava)
      }
      datumReader.setExpected(readerSchema)
      reader.sync(slice.start)
      private val end = slice.start + slice.length
      private val convert = AvroConv.recordReader(readerSchema, required)
      private var record: GenericRecord = _
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (!reader.hasNext || reader.pastSync(end)) false
        else {
          record = reader.next(record) // container reuse: zero-alloc steady state
          row = convert(record)
          true
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = reader.close() // closes the FsInput too
    }
  }
}

// ------------------------------------------------------------------ write

class AvroWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(info.schema(), info.options(), doTruncate)
  }
}

class AvroBatchWrite(schema: StructType, options: CaseInsensitiveStringMap,
    truncate: Boolean) extends BatchWrite {
  private val dir = AvroDataSource.paths(options).head
  private val codec = Option(options.get("compression")).getOrElse("snappy")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (truncate && fs.exists(path)) {
      // Overwrite semantics: clear prior part files before the job runs.
      // Non-transactional across concurrent writers — documented; the
      // transactional story belongs to table formats, not container files.
      fs.listStatus(path).foreach(s => fs.delete(s.getPath, true))
    }
    fs.mkdirs(path)
    new AvroWriterFactory(schema, dir, codec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val path = new Path(dir, "_SUCCESS")
    val fs = path.getFileSystem(new Configuration())
    fs.create(path, true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Best-effort: drop any stray .tmp files from failed attempts.
    val path = new Path(dir)
    val fs = path.getFileSystem(new Configuration())
    if (fs.exists(path))
      fs.listStatus(path).filter(_.getPath.getName.endsWith(".tmp"))
        .foreach(s => fs.delete(s.getPath, false))
  }
}

case class AvroCommit(file: String) extends WriterCommitMessage

class AvroWriterFactory(schema: StructType, dir: String, codec: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(schema, dir, codec, partitionId, taskId)
}

class AvroDataWriter(schema: StructType, dir: String, codec: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val conf = new Configuration()
  private val finalPath =
    new Path(dir, f"part-$partitionId%05d-$taskId.avro")
  private val tmpPath = new Path(dir, finalPath.getName + ".tmp")
  private val fs = tmpPath.getFileSystem(conf)
  private val avroSchema =
    AvroConv.structToAvro(schema, "spark_row", "graft.avro")
  private val convert = AvroConv.rowWriter(schema, avroSchema)
  private val writer = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(codec match {
      case "snappy" => CodecFactory.snappyCodec()
      case "deflate" => CodecFactory.deflateCodec(6)
      case "zstandard" => CodecFactory.zstandardCodec(3)
      case "null" | "none" | "uncompressed" => CodecFactory.nullCodec()
      case other => throw new IllegalArgumentException(
        s"graft-avro: unsupported codec '$other' " +
          "(snappy | deflate | zstandard | null)")
    })
    // 1 MiB sync interval: large enough to amortize block overhead,
    // small enough that maxPartitionBytes splits land on usable blocks.
    w.setSyncInterval(1 << 20)
    w.create(avroSchema, fs.create(tmpPath, true))
  }

  override def write(row: InternalRow): Unit = writer.append(convert(row))

  override def commit(): WriterCommitMessage = {
    writer.close()
    // One winner per partition (commit coordinator); rename is atomic on
    // real filesystems, overwrite-free here because the name embeds taskId.
    if (!fs.rename(tmpPath, finalPath))
      throw new java.io.IOException(s"graft-avro: rename $tmpPath failed")
    AvroCommit(finalPath.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}
