package graft.sources

import graft.Tables
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derived hive-partitioned layout of the `events` table — the physical
  * design a 100 TB event store actually uses (the reference's flat
  * per-dataset files, `bin/concatenate.py:62-77`, re-laid-out for scale):
  * `events_by_type_date/event_type=<t>/dt=<yyyy-MM-dd>/` parquet files.
  *
  * Partitioning by (low-cardinality key, date) is what makes the two
  * pruning paths demonstrable and cheap at scale:
  *  - static partition pruning: a literal `dt` predicate never opens
  *    non-matching directories (PartitionFilters in the scan, zero I/O
  *    for pruned days);
  *  - dynamic partition pruning: a selective dim-side filter on the
  *    partition key prunes fact directories at RUNTIME via the reused
  *    broadcast (`dynamicpruningexpression` in PartitionFilters).
  *
  * The layout is materialized once per (sfDir, events content) under
  * `target/graft-derived/` and memoized — identical pattern to the IVF
  * centroid memo (`Similarity.centroidCache`): the layout is a property
  * of the DATASET, not of any query; at production scale it is the
  * table's permanent storage layout, not a per-query step.
  */
object PartitionedData {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  /** Cheap change-detection signature: (name, length, mtime) over the
    * source file tree, so regenerated testdata re-materializes. */
  private def signature(d: String): Long = {
    val root = java.nio.file.Paths.get(d, "events.parquet")
    if (!java.nio.file.Files.exists(root)) return 0L
    val stream = java.nio.file.Files.walk(root)
    try {
      var acc = 17L
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        acc = acc * 31 + p.getFileName.toString.hashCode
        if (java.nio.file.Files.isRegularFile(p)) {
          acc = acc * 31 + java.nio.file.Files.size(p)
          acc = acc * 31 + java.nio.file.Files.getLastModifiedTime(p).toMillis
        }
      }
      acc
    } finally stream.close()
  }

  /** Path of the (event_type, dt)-partitioned events layout, writing it
    * on first use. 5 types × 30 days at test SF → 150 directories; the
    * partition columns are dropped from the data files (hive layout). */
  def eventsByTypeDate(spark: SparkSession, d: String): String = {
    val key = (d, signature(d))
    memo.computeIfAbsent(key, { _ =>
      val out = java.nio.file.Paths.get(
        "target", "graft-derived",
        f"events_by_type_date_${key._2}%016x").toAbsolutePath
      val done = out.resolve("_SUCCESS")
      if (!java.nio.file.Files.exists(done)) {
        Tables.t(spark, d, "events")
          .withColumn("dt", to_date(col("ts")))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("event_type", "dt")
          .parquet(out.toString)
      }
      out.toString
    })
  }
}
