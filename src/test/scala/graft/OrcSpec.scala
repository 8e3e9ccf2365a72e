package graft

import org.apache.spark.sql.functions._

/** ORC ingest (scan_orc_roundtrip): Spark's bundled ORC reader/writer
  * as the second real landing format next to the custom Avro source.
  * The oracle pins value-exactness against the parquet original; these
  * tests pin the fixture contract (exact row round-trip, memoized
  * landing, pruned scan).
  */
class OrcSpec extends SparkSpec {

  test("events round-trip through the ORC landing exactly " +
    "(long/timestamp/string/double)") {
    val dir = sources.PartitionedData.eventsOrcLanding(spark, sfDir)
    val src = Tables.t(spark, sfDir, "events")
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      src.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("landing is memoized per content signature (same path twice)") {
    val a = sources.PartitionedData.eventsOrcLanding(spark, sfDir)
    val b = sources.PartitionedData.eventsOrcLanding(spark, sfDir)
    assert(a === b)
  }

  test("filter and projection reach the ORC scan (pushdown)") {
    val dir = sources.PartitionedData.eventsOrcLanding(spark, sfDir)
    val df = spark.read.orc(dir)
      .filter(col("event_type") === "click")
      .select("event_id", "event_type")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("event_type"),
      s"ORC scan lost the pushed filter:\n$p")
    assert(p.contains("ReadSchema: struct<event_id:bigint,event_type:string>"),
      s"ORC scan reads more than the 2 projected columns:\n$p")
    assert(df.count() > 0)
  }

  test("registered query aggregates the landing and matches the " +
    "parquet original") {
    val got = SparkEntry.queries("scan_orc_roundtrip")(spark, sfDir)
      .collect()
    val want = Tables.t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        U.dsum(col("value")).as("sum_value"),
        max(U.tsUs(col("ts"))).as("max_ts_us"))
      .orderBy("event_type").collect()
    assert(got.toSeq === want.toSeq)
  }
}
