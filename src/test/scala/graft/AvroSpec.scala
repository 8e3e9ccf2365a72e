package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroDataSource

/** [[graft.sources.AvroDataSource]] — the from-scratch Avro V2
  * source/sink: type-faithful round-trips, sync-marker split reads,
  * reader-schema column pruning, append/overwrite modes, and by-name
  * refusals (general unions, partitionBy, unknown codec).
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("avro").toString

  private val fmt = "graft-avro"

  test("customer round-trips through avro exactly (long/int/double/string)") {
    val dir = tmp()
    val src = Tables.t(spark, sfDir, "customer")
    src.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      src.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("timestamps, dates, decimals, booleans, binary and arrays survive") {
    val dir = tmp()
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Timestamp.valueOf("2024-03-01 10:11:12.123456"),
          Date.valueOf("2024-03-01"), new java.math.BigDecimal("12345.6789"),
          true, Array[Byte](1, 2, -3), Seq(1.5f, -2.5f), Map("a" -> 2L),
          Row("inner", 7)),
        Row(2L, null, null, null, false, null, Seq.empty[Float],
          Map.empty[String, Long], null)),
      StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampType),
        StructField("d", DateType),
        StructField("dec", DecimalType(18, 4)),
        StructField("b", BooleanType),
        StructField("bin", BinaryType),
        StructField("vec", ArrayType(FloatType)),
        StructField("m", MapType(StringType, LongType)),
        StructField("nested", StructType(Seq(
          StructField("s", StringType), StructField("n", IntegerType)))))))
    df.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir).orderBy("id").collect()
    val r1 = back(0)
    assert(r1.getTimestamp(1) === Timestamp.valueOf("2024-03-01 10:11:12.123456"))
    assert(r1.getDate(2) === Date.valueOf("2024-03-01"))
    assert(r1.getDecimal(3) === new java.math.BigDecimal("12345.6789"))
    assert(r1.getBoolean(4))
    assert(r1.getAs[Array[Byte]](5).toSeq === Seq[Byte](1, 2, -3))
    assert(r1.getSeq[Float](6) === Seq(1.5f, -2.5f))
    assert(r1.getMap[String, Long](7) === Map("a" -> 2L))
    assert(r1.getStruct(8).getString(0) === "inner")
    val r2 = back(1)
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.isNullAt(3) &&
      r2.isNullAt(5) && r2.isNullAt(8))
  }

  test("embeddings (array<float>) round-trip preserves every component") {
    val dir = tmp()
    val src = Tables.t(spark, sfDir, "embeddings")
    src.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    // float equality is exact — avro stores raw IEEE bits
    assert(back.exceptAll(src).count() === 0)
    assert(back.count() === src.count())
  }

  test("one large file fans out across split partitions, rows intact") {
    val dir = tmp()
    val src = Tables.t(spark, sfDir, "orders").repartition(1)
    src.write.format(fmt).mode("overwrite")
      .option("compression", "null").save(dir)
    val back = spark.read.format(fmt)
      .option("maxpartitionbytes", (8 * 1024).toString).load(dir)
    val parts = back.rdd.getNumPartitions
    assert(parts > 4, s"expected many splits, got $parts")
    assert(back.count() === src.count())
    // every row lands in exactly one split — the sync/pastSync contract
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("column pruning reaches the scan's reader schema") {
    val dir = tmp()
    Tables.t(spark, sfDir, "customer").write.format(fmt)
      .mode("overwrite").save(dir)
    val q = spark.read.format(fmt).load(dir)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    q.collect() // materialize so AQE's final plan exists
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(flatten)) ++ (p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case s: QueryStageExec => flatten(s.plan)
        case _ => Seq.empty
      })
    val scans = flatten(q.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans.nonEmpty)
    assert(scans.head === Seq("c_nationkey"),
      s"reader schema not pruned: ${scans.head}")
    // and the pruned read still computes the right answer
    val viaParquet = Tables.t(spark, sfDir, "customer")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    assert(q.exceptAll(viaParquet).count() === 0)
  }

  test("append adds part files; overwrite truncates them") {
    val dir = tmp()
    val df = spark.range(5).toDF("v")
    df.write.format(fmt).mode("overwrite").save(dir)
    df.write.format(fmt).mode("append").save(dir)
    assert(spark.read.format(fmt).load(dir).count() === 10)
    df.write.format(fmt).mode("overwrite").save(dir)
    assert(spark.read.format(fmt).load(dir).count() === 5)
    // job commit marker present, no stray tmp files
    val names = new java.io.File(dir).list().toSeq
    assert(names.contains("_SUCCESS"))
    assert(!names.exists(_.endsWith(".tmp")))
  }

  test("zstandard and deflate codecs round-trip; unknown codec refused") {
    for (codec <- Seq("zstandard", "deflate")) {
      val dir = tmp()
      val df = Tables.t(spark, sfDir, "nation")
      df.write.format(fmt).mode("overwrite")
        .option("compression", codec).save(dir)
      assert(spark.read.format(fmt).load(dir).exceptAll(df).count() === 0)
    }
    val e = intercept[Exception] {
      spark.range(1).toDF("v").write.format(fmt).mode("overwrite")
        .option("compression", "lz77").save(tmp())
    }
    assert(e.getMessage.contains("unsupported codec") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported codec")))
  }

  test("partitionBy and general unions are refused by name") {
    val e1 = intercept[Exception] {
      spark.range(3).toDF("v").withColumn("p", lit("a"))
        .write.format(fmt).mode("overwrite").partitionBy("p").save(tmp())
    }
    assert(e1.getMessage.contains("partitionBy") ||
      Option(e1.getCause).exists(_.getMessage.contains("partitionBy")))

    // hand-build an avro file with a genuine two-branch union
    val dir = tmp()
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/u.avro"))
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put(0, 5)
    w.append(rec); w.close()
    val e2 = intercept[Exception] {
      spark.read.format(fmt).load(dir).collect()
    }
    assert(e2.getMessage.contains("union") ||
      Option(e2.getCause).exists(_.getMessage.contains("union")))
  }

  test("schema evolution: files missing a nullable column resolve to null") {
    // Day-1 files wrote (id, v); day-2 adds a nullable note column. The
    // table schema (inferred from the newest-by-sort file or supplied
    // explicitly) must read BOTH generations: Avro schema resolution
    // fills the missing field from its null default — the evolution
    // contract the writer encodes by defaulting every nullable field.
    val dir = tmp()
    val day1 = spark.range(3).toDF("id").withColumn("v", col("id") * 2)
    val day2 = spark.range(3, 5).toDF("id").withColumn("v", col("id") * 2)
      .withColumn("note", concat(lit("n"), col("id")))
    day1.write.format(fmt).mode("overwrite").save(s"$dir/d1")
    day2.write.format(fmt).mode("overwrite").save(s"$dir/d2")
    val evolved = spark.read.format(fmt)
      .schema("id long, v long, note string") // note nullable: evolution
      .load(s"$dir/d1", s"$dir/d2")
      .orderBy("id").collect()
    assert(evolved.length === 5)
    assert(evolved.take(3).forall(_.isNullAt(2)), "old files → null note")
    assert(evolved(3).getString(2) === "n3")
  }

  test("streaming ingestion: newly landed files arrive exactly once, " +
    "restart does not reprocess") {
    val land = tmp(); val ckpt = tmp(); val out = tmp()
    spark.range(5).toDF("v").write.format(fmt).mode("overwrite").save(land)
    // parquet sink: recoverable from the checkpoint (memory sink is not)
    // — this IS the landing-zone flow: avro stream in, columnar out
    def start() =
      spark.readStream.format(fmt).schema("v long").load(land)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    def landed: Seq[Long] =
      spark.read.parquet(out).as[Long].collect().sorted.toSeq
    val q = start()
    try {
      q.processAllAvailable()
      assert(landed === (0L until 5L))
      // a second producer job lands more files; the next trigger takes
      // exactly those
      spark.range(100, 103).toDF("v").write.format(fmt).mode("append")
        .save(land)
      q.processAllAvailable()
      assert(landed.size === 8)
    } finally q.stop()
    // restart from the checkpoint: previously committed files are NOT
    // reprocessed — the sink total stays 8 until a new file lands
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(landed.size === 8, "restart reprocessed committed files")
      spark.range(200, 202).toDF("v").write.format(fmt).mode("append")
        .save(land)
      q2.processAllAvailable()
      assert(landed === ((0L until 5L) ++ Seq(100L, 101L, 102L, 200L, 201L)))
    } finally q2.stop()
  }

  test("ingest pattern: avro in, parquet out, byte-identical analytics") {
    // The 100 TB landing-zone flow the source exists for: CDC/Kafka dumps
    // land as avro; the engine reads them splittable, converts to
    // columnar, and every downstream query runs on parquet.
    val land = tmp(); val warehouse = tmp()
    val src = Tables.t(spark, sfDir, "events")
    src.write.format(fmt).mode("overwrite").save(land)
    val landed = spark.read.format(fmt).load(land)
    landed.write.mode("overwrite").parquet(warehouse)
    val pq = spark.read.parquet(warehouse)
    assert(pq.exceptAll(src).count() === 0)
    assert(pq.count() === src.count())
  }
}
