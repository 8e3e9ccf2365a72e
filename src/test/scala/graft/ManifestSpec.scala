package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** [[graft.sources.ManifestTable]] — the miniature lakehouse format:
  * snapshot round-trips, stats-based FILE skipping (asserted by count,
  * not hoped for), append snapshots + time travel, metadata-only
  * counts, and atomic manifest commits.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("manifest").toString

  private def ordersRanged = Tables.t(spark, sfDir, "orders")
    .repartitionByRange(8, col("o_orderdate"))
    .sortWithinPartitions("o_orderdate")

  test("snapshot round-trip: read returns exactly what write committed") {
    val t = tmp()
    val v = ManifestTable.write(ordersRanged, t, Seq("o_orderdate"))
    assert(v === 1)
    val back = ManifestTable.read(spark, t)
    val src = Tables.t(spark, sfDir, "orders")
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
  }

  test("range read skips files from manifest stats alone") {
    val t = tmp()
    ManifestTable.write(ordersRanged, t, Seq("o_orderdate"))
    val (df, kept, total) = ManifestTable.readRange(
      spark, t, "o_orderdate", "1996-01-01 00:00:00", "1996-12-31 23:59:59")
    assert(total === 8)
    assert(kept < total, s"expected file skipping, kept $kept of $total")
    // pruned + residual filter ≡ full-scan filter (no lost rows)
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val pruned = df.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val full = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    assert(pruned.count() === full.count())
    assert(pruned.exceptAll(full).count() === 0)
    // and the pruned frame really reads fewer files
    assert(pruned.inputFiles.length < full.inputFiles.length ||
      full.inputFiles.length <= kept)
  }

  test("append creates a new snapshot; time travel reads the old one") {
    val t = tmp()
    val base = Tables.t(spark, sfDir, "orders").limit(100)
    ManifestTable.write(base, t, Seq("o_orderkey"))
    val more = Tables.t(spark, sfDir, "orders").limit(150)
    val v2 = ManifestTable.write(more, t, Seq("o_orderkey"), SaveMode.Append)
    assert(v2 === 2)
    assert(ManifestTable.versions(t) === Seq(1, 2))
    assert(ManifestTable.read(spark, t, Some(1)).count() === 100)
    assert(ManifestTable.read(spark, t).count() === 250)
    // metadata-only count: no data files touched
    assert(ManifestTable.countFromMetadata(t, Some(1)) === 100)
    assert(ManifestTable.countFromMetadata(t) === 250)
  }

  test("compact merges small files into a new snapshot; vacuum expires") {
    val t = tmp()
    // 8 small files → compaction target 2
    ManifestTable.write(ordersRanged, t, Seq("o_orderdate"))
    val v2 = ManifestTable.compact(spark, t, Seq("o_orderdate"),
      targetFiles = 2)
    assert(v2 === 2)
    // same rows, fewer files, v1 still readable (time travel intact)
    val src = Tables.t(spark, sfDir, "orders")
    val after = ManifestTable.read(spark, t)
    assert(after.count() === src.count())
    assert(after.exceptAll(src).count() === 0)
    assert(after.inputFiles.length === 2)
    assert(ManifestTable.read(spark, t, Some(1)).inputFiles.length === 8)
    // vacuum v1: its files (unreferenced by v2) are deleted, v1 gone
    val deleted = ManifestTable.vacuum(t, keepFrom = 2)
    assert(deleted === 8)
    assert(ManifestTable.versions(t) === Seq(2))
    assert(ManifestTable.read(spark, t).count() === src.count())
    intercept[Exception] { ManifestTable.read(spark, t, Some(1)).count() }
  }

  test("end-to-end ingest: avro landing → stream → parquet → " +
    "manifest snapshot → pruned query matches the source") {
    val land = tmp(); val ckpt = tmp(); val stage = tmp(); val table = tmp()
    val orders = Tables.t(spark, sfDir, "orders")
    // producer lands avro in two batches; the stream stages to parquet
    orders.filter(col("o_orderkey") % 2 === 0)
      .write.format("graft-avro").mode("overwrite").save(land)
    val q = spark.readStream.format("graft-avro").schema(orders.schema)
      .load(land)
      .writeStream.format("parquet").option("path", stage)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      orders.filter(col("o_orderkey") % 2 === 1)
        .write.format("graft-avro").mode("append").save(land)
      q.processAllAvailable()
    } finally q.stop()
    // snapshot the staged parquet as a manifest table, date-clustered
    ManifestTable.write(
      spark.read.parquet(stage)
        .repartitionByRange(4, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate"),
      table, Seq("o_orderdate"))
    val (df, kept, total) = ManifestTable.readRange(spark, table,
      "o_orderdate", "1996-01-01 00:00:00", "1996-12-31 23:59:59")
    assert(kept < total, "expected manifest file skipping")
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val viaPipeline = df
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val direct = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    assert(viaPipeline.count() === direct.count())
    assert(viaPipeline.exceptAll(direct).count() === 0)
  }

  test("z-ordered manifest: stats prune files on EITHER clustering column") {
    // The manifest+zorder composition: files sorted by the Morton code
    // keep per-file min/max tight on BOTH dimensions, so one layout
    // serves range predicates on either column — what neither single-
    // column sort nor directory partitioning gives.
    val t = tmp()
    // z-order inputs must share a bit-range: custkey spans 0..149 at
    // this SF, so the date rebases to 16-day buckets 0..~150 (raw epoch
    // days ~9500+ would dominate the high Morton bits and the curve
    // would degenerate to a date sort)
    val day0 = lit(9131L) // epoch day of 1995-01-01, the corpus floor
    val zkey = call_function("zorder64", col("o_custkey"),
      (((unix_micros(col("o_orderdate")) / lit(86400000000L)).cast("long")
        - day0) / lit(16L)).cast("long"))
    val zordered = Tables.t(spark, sfDir, "orders")
      .repartitionByRange(32, zkey).sortWithinPartitions(zkey)
    ManifestTable.write(zordered, t, Seq("o_custkey", "o_orderdate"))
    // numeric stats compare numerically (types are in the manifest) —
    // a custkey range prunes files from the SAME layout...
    val (dfC, keptC, totC) = ManifestTable.readRange(spark, t, "o_custkey",
      "40", "60")
    assert(totC === 32)
    assert(keptC < totC, s"custkey prune kept $keptC of $totC")
    val viaC = dfC.filter(col("o_custkey").between(40, 60))
    val directC = Tables.t(spark, sfDir, "orders")
      .filter(col("o_custkey").between(40, 60))
    assert(viaC.count() === directC.count())
    assert(viaC.exceptAll(directC).count() === 0)
    // ...and a date range prunes too
    val (dfD, keptD, totD) = ManifestTable.readRange(spark, t,
      "o_orderdate", "1996-01-01 00:00:00", "1996-06-30 23:59:59")
    assert(totD === 32)
    assert(keptD < totD, s"date prune kept $keptD of $totD")
    // correctness after the date prune
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-07-01").cast("timestamp")
    val viaZ = dfD.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val direct = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    assert(viaZ.count() === direct.count())
    assert(viaZ.exceptAll(direct).count() === 0)
  }

  test("bloom index: point lookups skip files range stats cannot") {
    val t = tmp()
    // hash-scatter orders across files: every file's o_orderkey RANGE
    // covers the key space, so min/max stats prune nothing — the exact
    // case the bloom index exists for
    val scattered = Tables.t(spark, sfDir, "orders")
      .repartition(8, col("o_orderkey"))
    ManifestTable.write(scattered, t, Seq("o_orderkey"),
      bloomCols = Seq("o_orderkey"))
    // range stats really are useless on this layout: probe a key from
    // the middle of the domain — every file's [min, max] spans it
    val probe = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey").orderBy("o_orderkey").limit(750)
      .collect().last.getLong(0)
    val (_, keptR, totR) = ManifestTable.readRange(spark, t, "o_orderkey",
      probe.toString, probe.toString)
    assert(totR === 8 && keptR >= 6, "scattered layout should defeat ranges")
    // the bloom keeps almost nothing (1% fpp per file)
    val (df, keptB, totB) = ManifestTable.readPoint(spark, t, "o_orderkey",
      probe)
    assert(totB === 8)
    assert(keptB <= 2, s"bloom kept $keptB of $totB")
    val viaBloom = df.filter(col("o_orderkey") === probe)
    val direct = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderkey") === probe)
    assert(viaBloom.count() === direct.count())
    assert(viaBloom.exceptAll(direct).count() === 0)
    // a key that does not exist prunes everything (no false negatives
    // needed — blooms only ever over-keep)
    val (_, keptNone, _) = ManifestTable.readPoint(spark, t, "o_orderkey",
      -987654321L)
    assert(keptNone <= 1)
  }

  test("lakehouse table: clustered compaction keeps range stats tight — " +
    "the registered query's prune actually skips files") {
    val table = sources.PartitionedData.ordersLakehouseTable(spark, sfDir)
    // post-compaction snapshot: 4 range-clustered files
    assert(ManifestTable.versions(table).last === 2)
    val (df, kept, total) = ManifestTable.readRange(spark, table,
      "o_orderdate", "1998-01-01 00:00:00", "1999-01-01 00:00:00",
      hiExclusive = true)
    // the 1998 slice of a ~1995-2001 domain must NOT touch every file —
    // round-robin compaction would smear stats and keep all 4
    assert(total === 4 && kept < total, s"kept $kept of $total")
    val direct = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val pruned = df
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    assert(pruned.count() === direct.count())
    assert(pruned.exceptAll(direct).count() === 0)
  }

  test("copy-on-write merge rewrites only key-range-affected files; " +
    "untouched files carry over by reference") {
    val t = tmp()
    val orders = Tables.t(spark, sfDir, "orders")
    ManifestTable.write(
      orders.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      t, statsCols = Seq("o_orderkey"))
    val before = ManifestTable.read(spark, t).inputFiles.toSet
    // narrow change batch relative to the ACTUAL key domain: the first
    // file covers ~1/8th of it, so a batch inside the first 6% of the
    // domain must touch exactly one file
    val hiKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val updHi = hiKey / 16
    val delHi = hiKey / 10
    val changes = orders.filter(col("o_orderkey") < updHi)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
      .withColumn("__op", lit("U"))
      .unionByName(orders
        .filter(col("o_orderkey") >= updHi && col("o_orderkey") < delHi)
        .withColumn("__op", lit("D")))
    val v2 = ManifestTable.merge(spark, t, changes, "o_orderkey",
      clusterBy = Some("o_orderkey"))
    assert(v2 === 2)
    val after = ManifestTable.read(spark, t).inputFiles.toSet
    // selectivity: most files carried over by IDENTICAL path
    val carried = (before intersect after).size
    assert(carried >= 6, s"only $carried of ${before.size} files carried")
    // content: updates applied, deletes gone, counts consistent
    val merged = ManifestTable.read(spark, t)
    val nDel = orders
      .filter(col("o_orderkey") >= updHi && col("o_orderkey") < delHi).count()
    assert(merged.count() === orders.count() - nDel)
    assert(merged.filter(col("o_orderkey") >= updHi &&
      col("o_orderkey") < delHi).count() === 0)
    val updSum = merged.filter(col("o_orderkey") < updHi)
      .agg(graft.U.dsum(col("o_totalprice"))).head().getDouble(0)
    val origSum = orders.filter(col("o_orderkey") < updHi)
      .agg(graft.U.dsum(col("o_totalprice"))).head().getDouble(0)
    val nUpd = orders.filter(col("o_orderkey") < updHi).count()
    assert(math.abs(updSum - (origSum + nUpd * 1.0)) < 1e-6)
    // time travel: the pre-merge snapshot still reads the original
    assert(ManifestTable.read(spark, t, Some(1)).count() === orders.count())
  }

  test("streaming CDC: foreachBatch merges each micro-batch copy-on-write " +
    "into the manifest table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val t = tmp()
    val orders = Tables.t(spark, sfDir, "orders")
    ManifestTable.write(
      orders.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"),
      t, statsCols = Seq("o_orderkey"))
    val hiKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val (updHi, delHi) = (hiKey / 16, hiKey / 10)
    // the CDC stream carries full rows + op; two micro-batches
    val changes = orders.filter(col("o_orderkey") < delHi)
      .withColumn("o_totalprice",
        when(col("o_orderkey") < updHi, col("o_totalprice") + 5.0)
          .otherwise(col("o_totalprice")))
      .withColumn("__op",
        when(col("o_orderkey") < updHi, "U").otherwise("D"))
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderdate", $"o_orderpriority", $"__op")
      .as[(Long, Long, String, Double, java.sql.Timestamp, String, String)]
      .collect().toSeq
    val (b1, b2) = changes.splitAt(changes.length / 2)
    val input = MemoryStream[(Long, Long, String, Double,
      java.sql.Timestamp, String, String)]
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority", "__op")
    val q = input.toDS().toDF(cols: _*)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          ManifestTable.merge(spark, t, batch.toDF(),
            "o_orderkey", clusterBy = Some("o_orderkey"))
        ()
      }
      .start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // one commit per non-empty micro-batch on top of v1
    assert(ManifestTable.versions(t).last === 3)
    val merged = ManifestTable.read(spark, t)
    val nDel = orders.filter(col("o_orderkey") >= updHi &&
      col("o_orderkey") < delHi).count()
    assert(merged.count() === orders.count() - nDel)
    val updSum = merged.filter(col("o_orderkey") < updHi)
      .agg(graft.U.dsum(col("o_totalprice"))).head().getDouble(0)
    val origSum = orders.filter(col("o_orderkey") < updHi)
      .agg(graft.U.dsum(col("o_totalprice"))).head().getDouble(0)
    val nUpd = orders.filter(col("o_orderkey") < updHi).count()
    assert(math.abs(updSum - (origSum + nUpd * 5.0)) < 1e-6)
  }

  test("compaction preserves bloom indexes: readPoint works after compact") {
    val t = tmp()
    val scattered = Tables.t(spark, sfDir, "orders")
      .repartition(8, col("o_orderkey"))
    ManifestTable.write(scattered, t, Seq("o_orderkey"),
      bloomCols = Seq("o_orderkey"))
    val probe = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey").orderBy("o_orderkey").limit(750)
      .collect().last.getLong(0)
    // compact everything into 2 files — the new entries must carry
    // REBUILT blooms (an index the writer asked for cannot silently
    // vanish on maintenance), so the point-lookup path still works
    val v2 = ManifestTable.compact(spark, t, Seq("o_orderkey"),
      targetFiles = 2)
    assert(v2 === 2)
    val (df, kept, tot) = ManifestTable.readPoint(spark, t, "o_orderkey",
      probe)
    assert(tot === 2 && kept >= 1)
    val direct = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderkey") === probe)
    val viaBloom = df.filter(col("o_orderkey") === probe)
    assert(viaBloom.count() === direct.count())
    assert(viaBloom.exceptAll(direct).count() === 0)
  }

  test("all-null stats column: file kept unconditionally, no crash") {
    val t = tmp()
    val df = spark.range(10).toDF("id")
      .withColumn("maybe", when(col("id") < 0, col("id"))) // all null
    ManifestTable.write(df, t, Seq("id", "maybe"))
    // null stats = unknown → the range read keeps the file (never wrong,
    // just unpruned) and values survive
    val (got, kept, total) = ManifestTable.readRange(spark, t, "maybe",
      "0", "5")
    assert(kept === total)
    assert(got.count() === 10)
    // a real column on the same table still prunes normally (range(10)
    // writes several files; ids 6+ files drop out of [0, 5])
    val (gotId, keptId, _) = ManifestTable.readRange(spark, t, "id", "0", "5")
    assert(keptId < total)
    assert(gotId.filter(col("id") <= 5).count() === 6)
  }

  test("manifest commits are atomic: no tmp files, complete snapshots") {
    val t = tmp()
    ManifestTable.write(Tables.t(spark, sfDir, "nation"), t, Seq("n_nationkey"))
    val mdir = new java.io.File(s"$t/_manifests")
    // Hadoop's local FS adds .crc sidecars — hidden files don't count
    val names = mdir.list().toSeq.filterNot(_.startsWith("."))
    assert(names === Seq("v00001.json"))
    assert(!names.exists(_.endsWith(".tmp")))
  }

  test("two-writer conflict: the version claim is first-wins, the loser " +
    "never corrupts the chain") {
    // Deterministic conflict via the commit primitive: both writers
    // derived from v1 and race for v2. Exactly one claim must succeed,
    // and the committed v2 must be the WINNER's content, bit-for-bit
    // untouched by the loser's attempt.
    val t = tmp()
    ManifestTable.write(ordersRanged.limit(50), t, Seq("o_orderdate"))
    val base = ManifestTable.readManifest(t, 1)
    val a = base.map(e => e.copy(rows = e.rows)) // writer A: same files
    val b = base.take(1) // writer B: different content
    assert(ManifestTable.tryCommitManifest(t, 2, a, Seq("o_orderdate"),
      Map("o_orderdate" -> "date")))
    assert(!ManifestTable.tryCommitManifest(t, 2, b, Seq("o_orderdate"),
      Map("o_orderdate" -> "date")), "second claim of v2 must lose")
    assert(ManifestTable.readManifest(t, 2).map(_.path) === a.map(_.path),
      "v2 must still be the winner's manifest")
    // the loser's retry at the NEXT version succeeds; chain stays sane
    assert(ManifestTable.tryCommitManifest(t, 3, b, Seq("o_orderdate"),
      Map("o_orderdate" -> "date")))
    assert(ManifestTable.versions(t) === Seq(1, 2, 3))
    // no stray tmp files from the failed claim
    val dir = new java.io.File(t, "_manifests")
    assert(!dir.listFiles().map(_.getName).exists(_.contains(".tmp")))
  }

  test("two concurrent appends both land: claim-loop retry serializes " +
    "them without losing either writer's rows") {
    val t = tmp()
    // deterministically disjoint writer inputs, keyed on o_orderkey
    val orders = Tables.t(spark, sfDir, "orders")
    val base = orders.filter(col("o_orderkey") % 7 === 0)
    val moreA = orders.filter(col("o_orderkey") % 7 === 1)
    val moreB = orders.filter(col("o_orderkey") % 7 === 2)
    val (nBase, nA, nB) = (base.count(), moreA.count(), moreB.count())
    ManifestTable.write(base, t, Seq("o_orderdate"))
    // Both writers start from the SAME observed snapshot (v1) and
    // commit through the claim loop from two threads released together:
    // whichever loses the v2 race must retry, re-read v2, and land as
    // v3 carrying the winner's files forward.
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = { gate.await()
          ManifestTable.write(moreA, t, Seq("o_orderdate"), SaveMode.Append) }
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = { gate.await()
          ManifestTable.write(moreB, t, Seq("o_orderdate"), SaveMode.Append) }
      })
      val (va, vb) = (fa.get(), fb.get())
      assert(Set(va, vb) === Set(2, 3), s"got versions $va, $vb")
    } finally pool.shutdown()
    assert(ManifestTable.versions(t) === Seq(1, 2, 3))
    // v3 (the final snapshot) contains base + BOTH appends — nothing
    // lost, nothing doubled
    val finalRows = ManifestTable.read(spark, t)
    assert(finalRows.count() === nBase + nA + nB)
    assert(finalRows.exceptAll(base.unionByName(moreA).unionByName(moreB))
      .count() === 0)
    // and every version in the chain still parses + scans
    for (v <- ManifestTable.versions(t))
      ManifestTable.read(spark, t, Some(v)).count()
  }
}
