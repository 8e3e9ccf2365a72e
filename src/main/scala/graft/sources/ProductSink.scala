package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks — SURVEY.md §2 A.1.
  *
  * The reference's I/O boundary re-expressed Spark-first:
  *  - TSV with an explicit schema, never inference (`bin/concatenate.py:
  *    121` reads TSV all-string; schema inference is a full extra scan at
  *    100 TB, so the engine requires a `StructType` at every text source);
  *  - multiLine JSON documents (`bin/upload.py:26-28`);
  *  - the data product sink (`bin/concatenate.py:150-152` .h5mu + metadata
  *    JSON): modality/dataset-partitioned parquet + a one-row JSON sidecar
  *    carrying uuid/creation-time/counts — partition columns give
  *    partition pruning on every downstream read, and the sidecar is the
  *    `uns` dict analog (SURVEY §1.4). Writing to `s3a://` URIs is the
  *    same call — no separate upload step (`bin/upload.py:14-22`).
  */
object ProductSink {

  /** Explicit-schema TSV source (scan_tsv_typed). */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** TSV sink with header (sink_tsv, make_uuids_tsv.py:164). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** multiLine JSON document source (scan_json_doc). */
  def readJsonDoc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** ORC sink/source (sink_orc) — the second columnar format warehouses
    * standardize on (Hive ecosystems). Same partition-pruning and
    * predicate-pushdown story as parquet (ORC stripe/row-group stats);
    * Spark's native vectorized ORC reader is built in, so offering the
    * format is a `.orc` call, not a new engine path. zlib over snappy:
    * cold archival copies trade CPU for bytes. Avro is offered as the
    * INGEST/interchange format only — `format("graft-avro")`, a
    * from-scratch DSv2 on the avro core jars ([[AvroDataSource]]:
    * splittable sync-marker reads, reader-schema pruning) — because a
    * row-major format has no stats-pruning story at 100 TB: avro in,
    * columnar (parquet/ORC) out. */
  def writeOrc(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", "zlib")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write a multimodal data product: fact rows partitioned by
    * (modality, dataset) + metadata JSON sidecar. Mirrors
    * `bin/concatenate.py:81-96,140-152`: product uuid, creation time,
    * dataset list, total cell count. The non-deterministic fields
    * (uuid(), current_timestamp()) live only here — never in
    * oracle-checked query output (SURVEY §7.4.1).
    */
  def writeProduct(fact: DataFrame, outDir: String): Unit = {
    fact.write.mode(SaveMode.Overwrite)
      .partitionBy("modality", "dataset")
      .parquet(s"$outDir/fact")

    // fs_file_size (bin/concatenate.py:151): product size via the Hadoop
    // FileSystem API — works identically against s3a:// at scale.
    val spark = fact.sparkSession
    val factPath = new org.apache.hadoop.fs.Path(s"$outDir/fact")
    val fs = factPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byteSize = fs.getContentSummary(factPath).getLength

    val meta = fact.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("cell_id")).as("total_cell_count"),
      sort_array(collect_set(col("dataset"))).as("datasets"))
      .withColumn("raw_file_size_bytes", lit(byteSize))
      .withColumn("product_uuid", expr("uuid()"))
      .withColumn("creation_time", date_format(current_timestamp(),
        "yyyy-MM-dd HH:mm:ss"))
    meta.coalesce(1).write.mode(SaveMode.Overwrite).json(s"$outDir/metadata")
  }

  /** Read a written product back with partition pruning available on
    * modality/dataset. */
  def readProduct(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/fact")

  /** Incremental refresh of ONLY the partitions present in `delta`
    * (sink_partition_overwrite): dynamic partition-overwrite mode
    * rewrites the directories the delta touches and leaves every other
    * partition's files untouched — the idempotent daily-refresh pattern
    * for a partitioned 100 TB product (re-running a day replaces that
    * day, never truncates the table, unlike static overwrite which
    * drops ALL partitions first). The mode is a PER-WRITE option, never
    * a session-conf mutation: the conf is read at execution time, so a
    * set/restore around the write races with concurrent writers on the
    * same session (a finally-restore from one caller can flip another
    * caller's still-executing overwrite back to table-truncating static
    * mode). */
  def overwritePartitions(delta: DataFrame, outDir: String,
      partitionCols: Seq[String]): Unit =
    delta.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(outDir)

  /** Small-file compaction (sink_compact): rewrite one parquet leaf
    * directory (a single partition, or an unpartitioned table) into
    * ~`targetFileBytes` files; partitioned tables compact partition by
    * partition, so a refresh never rewrites the table.
    * Long-running incremental pipelines accrete per-batch small files
    * until open/list/footer overhead dominates the scan; periodic
    * compaction is table maintenance, not a query. File count is sized
    * from actual bytes (never a hardcoded N that silently under- or
    * over-splits at a different scale). Returns (filesBefore, filesAfter).
    *
    * CONTRACT: the caller must exclude concurrent writers on `dir` for
    * the duration (plain parquet has no transaction log — a batch
    * appended between the snapshot read and the swap would be lost;
    * table formats with commit protocols are the concurrent-writer
    * answer, not this). Crash recovery: the swap is two renames; a crash
    * between them leaves the full pre-compaction data intact at
    * `<dir>._compact_old` — rename it back. Old data is deleted only
    * after the promote rename succeeds. */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    // normalize via Path so a trailing slash can't turn the staging
    // dirs into children of the directory being swapped
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = path.suffix("._compact_tmp")
    val old = path.suffix("._compact_old")
    require(!fs.exists(old),
      s"compact: $old exists — a previous compaction crashed mid-swap; " +
        "inspect and rename it back (or delete it) before compacting")
    def parquetFiles(): Long = {
      val it = fs.listFiles(path, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = parquetFiles()
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(path.toString)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // staged swap: rename old out of the way, promote, then clean
    require(fs.rename(path, old), s"compact: could not stage $path")
    require(fs.rename(tmp, path), s"compact: could not promote $tmp")
    fs.delete(old, true)
    val after = parquetFiles()
    (before, after)
  }
}
