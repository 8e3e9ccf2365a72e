package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming execution tests (SURVEY.md §5.2 item 5): the same
  * transforms the DuckDB oracle checks in batch, executed incrementally
  * over MemoryStream with watermarks, plus the stream-only stateful ops
  * (dropDuplicatesWithinWatermark, flatMapGroupsWithState).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000)

  test("tumbling window agg over a stream matches batch semantics") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.tumblingAgg(df).writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete").start()
    try {
      input.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0),
        (ts(70), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select("ws_us", "event_type", "n")
        .as[(Long, String, Long)].collect().toSet
      assert(rows === Set(
        (0L, "click", 2L),
        (3600L * 1000000, "view", 1L)))
    } finally q.stop()
  }

  test("windowed top-k: incremental counts + finalized-window rank " +
    "match the batch analog") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    // stage 1 runs incrementally (the stateful windowed count);
    // stage 2 (rank) applies to finalized windows downstream — here on
    // the completed memory sink, as it would in foreachBatch
    val counts = df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"))
    val q = counts.writeStream.format("memory")
      .queryName("wtopk_counts").outputMode("complete").start()
    try {
      val rows = Seq(
        (ts(1), "click", 1.0), (ts(2), "click", 1.0), (ts(3), "view", 1.0),
        (ts(4), "view", 1.0), (ts(5), "view", 1.0), (ts(6), "buy", 1.0),
        (ts(7), "scroll", 1.0), (ts(65), "buy", 1.0))
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
      val W = org.apache.spark.sql.expressions.Window
      val ranked = spark.table("wtopk_counts")
        .withColumn("rnk", row_number().over(
          W.partitionBy("ws_us").orderBy(col("n").desc, col("event_type")))
          .cast("long"))
        .filter(col("rnk") <= 3)
        .select("ws_us", "event_type", "n", "rnk")
        .as[(Long, String, Long, Long)].collect().toSet
      val batch = StreamingOps.windowTopK(
        rows.toDF("ts", "event_type", "value"))
        .select("ws_us", "event_type", "n", "rnk")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(ranked == batch)
      // hour 0: view(3) > click(2) > buy=1 < scroll... rank3 is buy
      // (tie with scroll broken alphabetically)
      assert(batch.contains((0L, "view", 3L, 1L)))
      assert(batch.contains((0L, "buy", 1L, 3L)))
      assert(!batch.exists(r => r._1 == 0L && r._2 == "scroll"))
    } finally q.stop()
  }

  test("streaming SCD2 emits closed intervals incrementally, " +
    "matching the batch query across batch boundaries") {
    implicit val ctx = spark.sqlContext
    // real events from the test SF, split into two event-time-ordered
    // batches so intervals must CLOSE ACROSS the batch boundary via the
    // state store
    val ev = Tables.t(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts").as("tsu"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._2, r._3))
    val (b1s, b2s) = ev.splitAt(ev.length / 2)
    // shuffle WITHIN each batch: the state machine must sort its group
    // rows by event time itself (iterators arrive unordered)
    val rnd = new scala.util.Random(7)
    val (b1, b2) = (rnd.shuffle(b1s.toSeq), rnd.shuffle(b2s.toSeq))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingOps.scd2Changes(
      input.toDS().toDF("user_id", "tsu", "event_id", "event_type")
        .as[(Long, Long, Long, String)])
      .toDF("user_id", "state", "valid_from", "valid_to")
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      val afterB1 = spark.table("scd2_out").count()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("scd2_out")
        .as[(Long, String, Long, Long)].collect().toSet
      // batch reference over the same data: the registered oracled query
      val batch = StreamingOps.queries("stream_scd2_changes")(spark, sfDir)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed === batch,
        s"streamed ${streamed.size} closed intervals != batch ${batch.size}")
      assert(afterB1 > 0 && afterB1 < batch.size,
        "expected intervals to close in BOTH batches (boundary crossed)")
    } finally q.stop()
  }

  test("streaming EWMA folds through the state store across batches, " +
    "final summary matches the batch query") {
    implicit val ctx = spark.sqlContext
    val ev = Tables.t(spark, sfDir, "events")
      .filter($"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("tsu"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (r._2, r._3))
    val (b1s, b2s) = ev.splitAt(ev.length / 2)
    // shuffle within each batch: the fold must order its group itself
    val rnd = new scala.util.Random(11)
    val (b1, b2) = (rnd.shuffle(b1s.toSeq), rnd.shuffle(b2s.toSeq))
    val input = MemoryStream[(Long, Long, Long, Double)]
    val q = StreamingOps.ewmaPerKey(
      input.toDS().toDF("user_id", "tsu", "event_id", "value")
        .as[(Long, Long, Long, Double)])
      .toDF("user_id", "n_events", "ewma")
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      // each batch appends a running summary — the LAST per user is the
      // state at stream end, and must equal the batch fold exactly
      // (the accumulator carried through the state store, not reset)
      val streamed = spark.table("ewma_out")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"ewma")).as("s"))
        .select($"user_id", $"s.n_events", round($"s.ewma" * 1e6) / 1e6)
        .as[(Long, Long, Double)].collect().toSet
      val batch = StreamingOps.queries("stream_ewma")(spark, sfDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming Holt linear trend folds level+trend through the state " +
    "store across batches, final summary matches the batch query") {
    implicit val ctx = spark.sqlContext
    val ev = Tables.t(spark, sfDir, "events")
      .filter($"value".isNotNull)
      .select($"user_id", unix_micros($"ts").as("tsu"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (r._2, r._3))
    val (b1s, b2s) = ev.splitAt(ev.length / 2)
    val rnd = new scala.util.Random(13)
    val (b1, b2) = (rnd.shuffle(b1s.toSeq), rnd.shuffle(b2s.toSeq))
    val input = MemoryStream[(Long, Long, Long, Double)]
    val q = StreamingOps.holtPerKey(
      input.toDS().toDF("user_id", "tsu", "event_id", "value")
        .as[(Long, Long, Long, Double)])
      .toDF("user_id", "n_events", "level", "trend")
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("holt_out")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"level", $"trend")).as("s"))
        .select($"user_id", $"s.n_events",
          round($"s.level" * 1e6) / 1e6, round($"s.trend" * 1e6) / 1e6)
        .as[(Long, Long, Double, Double)].collect().toSet
      val batch = StreamingOps.queries("stream_holt_linear")(spark, sfDir)
        .select($"user_id", $"n_events", $"level", $"trend")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermark drops late rows beyond the threshold") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k").count()
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      input.addData((ts(5), "a"))          // window [0,10)
      q.processAllAvailable()
      input.addData((ts(40), "a"))         // watermark → 30min; closes [0,10)
      q.processAllAvailable()
      input.addData((ts(6), "a"))          // LATE: < watermark → dropped
      input.addData((ts(41), "a"))
      q.processAllAvailable()
      val emitted = spark.table("wm_out")
        .select(unix_micros($"window.start").as("ws"), $"count")
        .as[(Long, Long)].collect().toSet
      // [0,10) emitted exactly once with count 1 — the late row never lands.
      assert(emitted === Set((0L, 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups a stream by key") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val dedup = input.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(1), 1L, "click"), (ts(2), 1L, "click"),
        (ts(3), 1L, "view"), (ts(4), 2L, "click"))
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n === 3) // (1,click), (1,view), (2,click)
    } finally q.stop()
  }

  test("flatMapGroupsWithState: custom running-count state machine") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counted = input.toDF().toDF("user_id", "event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, events: Iterator[(Long, String)], state: GroupState[Long]) => {
          val prev = state.getOption.getOrElse(0L)
          val next = prev + events.size
          state.update(next)
          Iterator((user, next))
        })
    val q = counted.toDF("user_id", "n").writeStream
      .format("memory").queryName("fmgws_out").outputMode("update").start()
    try {
      input.addData((1L, "a"), (1L, "b"), (2L, "a"))
      q.processAllAvailable()
      input.addData((1L, "c"))
      q.processAllAvailable()
      val last = spark.table("fmgws_out")
        .groupBy("user_id").agg(max("n").as("n"))
        .as[(Long, Long)].collect().toSet
      assert(last === Set((1L, 3L), (2L, 1L))) // state carried across batches
    } finally q.stop()
  }

  test("file sink + checkpoint: stream restarts resume from state, no reprocessing") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[(Timestamp, Long)]
    def start() = input.toDF().toDF("ts", "user_id")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      input.addData((ts(1), 1L), (ts(2), 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    // Restart against the same checkpoint: only new data lands.
    val q2 = start()
    try {
      input.addData((ts(3), 3L))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
    assert(rows.count() === 3) // 2 from run 1 + 1 from run 2, no dupes
  }

  test("watermarked stream-stream join bounds state and matches in-window pairs") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val impDf = imps.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "20 minutes")
    val clkDf = clicks.toDF().toDF("ad_id2", "clk_ts").withWatermark("clk_ts", "20 minutes")
    val joined = impDf.join(clkDf,
      expr("""ad_id = ad_id2 AND
             |clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 10 minutes""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    // Non-epoch-zero base: watermark arithmetic near 1970-01-01 floors at
    // zero and suppresses emission.
    def mts(minutes: Long): Timestamp =
      new Timestamp((50L * 365 * 24 * 60 + minutes) * 60 * 1000)
    try {
      imps.addData((1L, mts(0)), (2L, mts(0)))
      q.processAllAvailable()
      clicks.addData((1L, mts(5)))   // in window → match
      clicks.addData((2L, mts(15)))  // 15min > 10min window → no match
      q.processAllAvailable()
      val rows = spark.table("ssj_out").select("ad_id")
        .as[Long].collect().toSeq
      assert(rows === Seq(1L))
    } finally q.stop()
  }

  test("update output mode re-emits only the windows a batch changed") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .groupBy(window($"ts", "10 minutes"), $"k").count()
      .select(unix_micros($"window.start").as("ws"), $"k", $"count")
    val q = agg.writeStream.format("memory").queryName("upd_out")
      .outputMode("update").start()
    try {
      input.addData((ts(1), "a"), (ts(2), "a"))   // window 0: a=2
      q.processAllAvailable()
      val afterB1 = spark.table("upd_out").collect().length
      assert(afterB1 === 1) // one (window, key) group emitted
      input.addData((ts(3), "a"), (ts(12), "b"))  // touch w0/a, open w10/b
      q.processAllAvailable()
      val rows = spark.table("upd_out")
        .select("ws", "k", "count").as[(Long, String, Long)].collect()
      // exactly the two CHANGED groups were appended — an untouched
      // group is never re-emitted in update mode
      assert(rows.length === afterB1 + 2, rows.toSeq.toString)
      // the sink holds both versions of w0/a; latest state is count=3
      assert(rows.toSet === Set(
        (0L, "a", 2L), (0L, "a", 3L), (600L * 1000000, "b", 1L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched rows null-complete only " +
    "after the watermark closes their window") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val impDf = imps.toDF().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val clkDf = clicks.toDF().toDF("ad_id2", "clk_ts")
      .withWatermark("clk_ts", "10 minutes")
    val joined = impDf.join(clkDf,
      expr("""ad_id = ad_id2 AND
             |clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 5 minutes""".stripMargin),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer_out")
      .outputMode("append").start()
    def mts(minutes: Long): Timestamp =
      new Timestamp((50L * 365 * 24 * 60 + minutes) * 60 * 1000)
    try {
      imps.addData((1L, mts(0)), (2L, mts(0)))
      clicks.addData((1L, mts(3))) // matches imp 1; imp 2 stays pending
      q.processAllAvailable()
      val early = spark.table("ssj_outer_out")
        .select("ad_id", "ad_id2").as[(Long, Option[Long])].collect()
      // imp 2 must NOT null-complete yet: its join window is still open
      assert(early.toSet === Set((1L, Some(1L))))
      // advance both watermarks far past imp 2's window [0, 5]
      imps.addData((9L, mts(60)))
      clicks.addData((9L, mts(60)))
      q.processAllAvailable()
      // one more batch so the outer-null completion (evaluated against
      // the watermark computed at batch START) lands in the sink
      imps.addData((10L, mts(61)))
      clicks.addData((10L, mts(61)))
      q.processAllAvailable()
      val later = spark.table("ssj_outer_out")
        .select("ad_id", "ad_id2").as[(Long, Option[Long])].collect()
      assert(later.contains((2L, None)),
        s"imp 2 never null-completed: ${later.toSeq}")
    } finally q.stop()
  }

  test("stream_join_interval: streaming execution matches the batch analog") {
    // The registered batch query (StreamingOps.clickViewJoin) and a
    // watermarked stream-stream join over the same rows must agree on
    // the per-click view counts.
    implicit val ctx = spark.sqlContext
    def mts(minutes: Long): Timestamp =
      new Timestamp((50L * 365 * 24 * 60 + minutes) * 60 * 1000)
    // (event_id, user_id, event_type, ts)
    val rows = Seq(
      (1L, 10L, "view", mts(0)), (2L, 10L, "view", mts(5)),
      (3L, 10L, "click", mts(8)),   // matches views at 0 and 5
      (4L, 20L, "view", mts(0)),
      (5L, 20L, "click", mts(15)),  // 15 > 10min window → no match
      (6L, 10L, "click", mts(30)))  // no views in window
    val batch = graft.streaming.StreamingOps.clickViewJoin(
      rows.toDF("event_id", "user_id", "event_type", "ts"))
      .as[(Long, Long)].collect().toMap
    assert(batch === Map(3L -> 2L))

    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val cDf = clicks.toDF().toDF("click_id", "user_id", "cts")
      .withWatermark("cts", "30 minutes")
    val vDf = views.toDF().toDF("vuser_id", "vts")
      .withWatermark("vts", "30 minutes")
    val joined = cDf.join(vDf,
      expr("""user_id = vuser_id AND vts <= cts AND
             |cts <= vts + interval 10 minutes""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("cvj_out")
      .outputMode("append").start()
    try {
      views.addData(rows.filter(_._3 == "view").map(r => (r._2, r._4)): _*)
      clicks.addData(rows.filter(_._3 == "click").map(r => (r._1, r._2, r._4)): _*)
      q.processAllAvailable()
      val streamed = spark.table("cvj_out").select("click_id")
        .as[Long].collect().toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("EwmaProcessor (transformWithState) matches the batch stream_ewma " +
    "query across shuffled batches — same fold, successor API") {
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = Tables.t(spark, sfDir, "events")
        .filter($"value".isNotNull)
        .select($"user_id", unix_micros($"ts").as("tsu"), $"event_id", $"value")
        .as[(Long, Long, Long, Double)].collect()
        .sortBy(r => (r._2, r._3))
      val (b1s, b2s) = ev.splitAt(ev.length / 2)
      // shuffle within each batch: the processor must order its group
      val rnd = new scala.util.Random(17)
      val (b1, b2) = (rnd.shuffle(b1s.toSeq), rnd.shuffle(b2s.toSeq))
      val input = MemoryStream[(Long, Long, Long, Double)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new StreamingOps.EwmaProcessor(),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update)
      val q = out.toDF("user_id", "n_events", "ewma").writeStream
        .format("memory").queryName("tws_ewma_out")
        .outputMode("update").start()
      try {
        input.addData(b1: _*)
        q.processAllAvailable()
        input.addData(b2: _*)
        q.processAllAvailable()
        // last summary per user = state at stream end; must equal the
        // batch fold (and therefore the unchanged stream_ewma oracle)
        val streamed = spark.table("tws_ewma_out")
          .groupBy($"user_id")
          .agg(max(struct($"n_events", $"ewma")).as("s"))
          .select($"user_id", $"s.n_events", round($"s.ewma" * 1e6) / 1e6)
          .as[(Long, Long, Double)].collect().toSet
        val batch = StreamingOps.queries("stream_ewma")(spark, sfDir)
          .as[(Long, Long, Double)].collect().toSet
        assert(streamed === batch)
      } finally q.stop()
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState (Spark 4 arbitrary-state API): running max per user") {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    class RunningMax extends StatefulProcessor[Long, (Long, Double), (Long, Double)] {
      @transient private var maxState: ValueState[Double] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        maxState = getHandle.getValueState[Double]("max",
          Encoders.scalaDouble, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
          timerValues: TimerValues): Iterator[(Long, Double)] = {
        val prev = if (maxState.exists()) maxState.get() else Double.MinValue
        val mx = rows.foldLeft(prev)((m, r) => math.max(m, r._2))
        maxState.update(mx)
        Iterator((key, mx))
      }
    }
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Double)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningMax, org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update)
      val q = out.toDF("user_id", "running_max").writeStream
        .format("memory").queryName("tws_out").outputMode("update").start()
      try {
        input.addData((1L, 2.0), (1L, 5.0), (2L, 1.0))
        q.processAllAvailable()
        input.addData((1L, 3.0)) // below running max → max stays 5
        q.processAllAvailable()
        val last = spark.table("tws_out")
          .groupBy("user_id").agg(max("running_max").as("m"))
          .as[(Long, Double)].collect().toSet
        assert(last === Set((1L, 5.0), (2L, 1.0)))
      } finally q.stop()
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming approx-distinct per key: HLL state stays bounded, estimate tracks exact") {
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[(Long, Long)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new StreamingOps.ApproxDistinctPerKey(),
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update)
      val q = out.toDF("user_id", "approx_distinct").writeStream
        .format("memory").queryName("hll_out").outputMode("update").start()
      try {
        // user 1 sees 500 distinct items over two batches (with repeats);
        // user 2 sees 3
        input.addData((0L until 300L).map(i => (1L, i)) ++
          Seq((2L, 10L), (2L, 11L), (2L, 10L)): _*)
        q.processAllAvailable()
        input.addData((200L until 500L).map(i => (1L, i)) ++
          Seq((2L, 12L)): _*)
        q.processAllAvailable()
        val last = spark.table("hll_out")
          .groupBy("user_id").agg(max("approx_distinct").as("d"))
          .as[(Long, Long)].collect().toMap
        // HLL lgK=12 → ~1.6% rsd; allow 5%
        assert(math.abs(last(1L) - 500.0) / 500.0 < 0.05, last.toString)
        assert(last(2L) === 3L)
      } finally q.stop()
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-static enrich: dim broadcast joins each micro-batch, " +
    "matches the batch analog") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = StreamingOps.staticEnrich(df, dim).writeStream
      .format("memory").queryName("enrich_out").outputMode("complete").start()
    try {
      input.addData((1L, ts(1), "click", 1.0), (2L, ts(2), "view", 2.0))
      q.processAllAvailable()
      input.addData((1L, ts(3), "click", 4.0), (3L, ts(4), "click", 8.0))
      q.processAllAvailable() // user 3 has no dim row → dropped (inner)
      val rows = spark.table("enrich_out")
        .select("c_mktsegment", "event_type", "n", "sum_value")
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows === Set(
        ("BUILDING", "click", 2L, 5.0),
        ("MACHINERY", "view", 1L, 2.0)))
    } finally q.stop()
  }

  test("foreachBatch + dynamic partition overwrite is an idempotent incremental sink") {
    // The exactly-once pattern for partitioned parquet without a
    // transactional table format: each micro-batch OVERWRITES exactly
    // the partitions it carries, so a replayed batch (crash before the
    // checkpoint commit) converges to the same files instead of
    // double-appending.
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-sink").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .groupBy($"event_type", to_date($"ts").as("dt"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_v"))
    def writeBatch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      sources.ProductSink.overwritePartitions(
        batch.withColumn("batch_id", lit(id)), dir, Seq("dt"))
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch(writeBatch _).start()
    try {
      input.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0))
      q.processAllAvailable()
      input.addData((ts(30), "view", 3.0))
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
        .select($"event_type", $"n", $"sum_v")
        .as[(String, Long, Double)].collect().toSet
      // batch 2's overwrite replaced batch 1's rows for the same day —
      // no double counting from the two complete-mode emissions
      assert(out === Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
      // replaying the last batch (crash before checkpoint commit →
      // same batch delivered again) converges: same partitions, same rows
      val replay = spark.read.parquet(dir)
        .select($"event_type", $"n", $"sum_v", $"batch_id", $"dt")
        .as[(String, Long, Double, Long, java.sql.Date)].collect().toSeq
      sources.ProductSink.overwritePartitions(
        replay.toDF("event_type", "n", "sum_v", "batch_id", "dt"),
        dir, Seq("dt"))
      assert(spark.read.parquet(dir)
        .select($"event_type", $"n", $"sum_v")
        .as[(String, Long, Double)].collect().toSet === out)
    } finally q.stop()
  }

  test("session window batch path groups by inactivity gap") {
    val df = Seq(
      (1L, ts(0)), (1L, ts(10)),          // session 1 (gap < 30min)
      (1L, ts(60)),                        // session 2
      (2L, ts(5)))
      .toDF("user_id", "ts").withColumn("value", lit(1.0))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type", lit("x")).withColumn("props", lit("{}"))
    val out = StreamingOps.sessionAgg(df)
      .select("user_id", "n").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("stream-static anti join screens a stream against a digest index") {
    // The streaming face of dedup_incremental: arriving docs drop when
    // their digest is already in the static historical index (per
    // micro-batch, stateless on the stream side — the static side is
    // the bucketed digest table at scale), composed with
    // dropDuplicatesWithinWatermark for within-stream copies.
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.md5
    val index = Seq("doc A", "doc B").toDF("text")
      .select(md5($"text").as("digest"))
    val input = MemoryStream[(Timestamp, Long, String)]
    val screened = input.toDF().toDF("ts", "doc_id", "text")
      .withColumn("digest", md5($"text"))
      .withWatermark("ts", "30 minutes")
      .join(index, Seq("digest"), "left_anti")
      .dropDuplicatesWithinWatermark("digest")
    val q = screened.writeStream.format("memory").queryName("incr_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(1), 10L, "doc A"),  // in index → dropped
        (ts(2), 11L, "doc C"),  // fresh → kept
        (ts(3), 12L, "doc C"),  // within-stream copy → dropped
        (ts(4), 13L, "doc D"))  // fresh → kept
      q.processAllAvailable()
      val kept = spark.table("incr_out")
        .select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(11L, 13L))
    } finally q.stop()
  }

  test("left-outer stream-stream join: matches emit inner rows, the " +
    "unmatched click emits its null row at view-watermark expiry") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("cts", "user_id", "click_id")
      .withWatermark("cts", "0 seconds")
    val v = views.toDF().toDF("vts", "v_uid")
      .withWatermark("vts", "0 seconds")
    val j = c.join(v,
      col("v_uid") === col("user_id") &&
        col("vts") <= col("cts") &&
        col("vts") >= col("cts") - expr("INTERVAL 10 minutes"),
      "leftOuter")
      .select(col("click_id"), col("v_uid"))
    val q = j.writeStream.format("memory").queryName("lsj_out")
      .outputMode("append").start()
    try {
      clicks.addData((ts(10), 1L, 100L), (ts(10), 2L, 200L))
      views.addData((ts(5), 1L)) // matches click 100; user 2 unmatched
      q.processAllAvailable()
      // push BOTH watermarks past click 200's match interval so its
      // buffered state expires; expiry rows surface a batch later
      clicks.addData((ts(60), 9L, 900L))
      views.addData((ts(60), 9L))
      q.processAllAvailable()
      clicks.addData((ts(120), 8L, 800L))
      views.addData((ts(120), 8L))
      q.processAllAvailable()
      val rows = spark.table("lsj_out")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows.contains((100L, Some(1L)))) // the inner match
      assert(rows.contains((200L, None)),     // the expiry emission
        s"unmatched click never expired: $rows")
    } finally q.stop()
  }

  test("left-outer interval join batch analog: zero-view clicks " +
    "survive with n_views = 0, late views don't count") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 5L, "view"),   // matches user 1's click at t=10
      (2L, 1L, 10L, "click"), // → 1 view
      (3L, 2L, 10L, "click"), // user 2: no views at all → 0
      (4L, 3L, 20L, "view"),  // AFTER user 3's click — must not count
      (5L, 3L, 10L, "click")) // → 0
      .map { case (id, u, t, ty) =>
        (id, u, new Timestamp(t * 60 * 1000), ty, 0.0)
      }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = StreamingOps.clickViewLeftJoin(ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1L, 3L -> 0L, 5L -> 0L))
  }
}
