package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Semantics of the resampling-inference family
  * ([[graft.operators.Resample]]) on planted fixtures and small real
  * data. Oracle parity at data scale is the driver's DuckDB gate;
  * these pin the math and the determinism contract.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrap CI: brackets the observed mean, 32 replicates, " +
    "deterministic across runs") {
    val r1 = Resample.queries("stats_bootstrap_ci")(spark, sfDir).head()
    assert(r1.getAs[Long]("b_reps") == 32L)
    val mean = r1.getAs[Double]("mean_x")
    val lo = r1.getAs[Double]("ci_lo"); val hi = r1.getAs[Double]("ci_hi")
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] should bracket $mean")
    // resampling noise of a mean over thousands of rows is small: the
    // trimmed interval must be tight around the point estimate
    assert((hi - lo) / mean < 0.2, s"CI implausibly wide: [$lo, $hi]")
    val r2 = Resample.queries("stats_bootstrap_ci")(spark, sfDir).head()
    assert(r1 == r2, "hash-driven resampling must be run-invariant")
  }

  test("bootstrap CI: partition invariance (decimal-bridged replicate " +
    "sums are fold-order independent)") {
    val tmp = Files.createTempDirectory("boot-part").toString
    Tables.t(spark, sfDir, "orders").repartition(7, col("o_custkey"))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val a = Resample.queries("stats_bootstrap_ci")(spark, sfDir).head()
    val b = Resample.queries("stats_bootstrap_ci")(spark, tmp).head()
    assert(a == b)
  }

  test("permutation test: p-value well-formed; counts partition the " +
    "filtered rows") {
    val r = Resample.queries("stats_permutation_test")(spark, sfDir).head()
    assert(r.getAs[Long]("b_reps") == 64L)
    val p = r.getAs[Double]("p_value")
    assert(p >= 1.0 / 65 - 1e-9 && p <= 1.0, s"p=$p")
    val exceed = r.getAs[Long]("exceed")
    assert(exceed >= 0L && exceed <= 64L)
    assert(math.abs(p - (exceed + 1.0) / 65.0) < 1e-6)
    val nFiltered = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(r.getAs[Long]("n_urgent") + r.getAs[Long]("n_high") == nFiltered)
  }

  test("permutation test: a real planted shift is significant, a null " +
    "shift is not") {
    // group A (keys 0..499) at 100.0, group B (keys 500..999) at 200.0:
    // every random re-deal mixes the two levels, so |diff_b| ≪ 100 and
    // the observed split must be the most extreme ⇒ p = 1/65.
    val tmp = Files.createTempDirectory("perm-shift").toString
    (0 until 1000).map { i =>
      val pri = if (i < 500) "1-URGENT" else "2-HIGH"
      val x = if (i < 500) 100.0 else 200.0
      (i.toLong, i.toLong, "O", x, new java.sql.Timestamp(0L), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Resample.queries("stats_permutation_test")(spark, tmp).head()
    assert(math.abs(r.getAs[Double]("diff_obs") + 100.0) < 1e-6)
    assert(r.getAs[Double]("p_value") == math.round(1.0 / 65 * 1e6) / 1e6)

    // same fixture with EXACTLY balanced group means (each group sees
    // the values 100..109 fifty times each): diff_obs = 0, so every
    // re-deal ties-or-exceeds it ⇒ p = 1 exactly
    val tmp2 = Files.createTempDirectory("perm-null").toString
    (0 until 1000).map { i =>
      val pri = if (i % 2 == 0) "1-URGENT" else "2-HIGH"
      (i.toLong, i.toLong, "O", 100.0 + (i / 2) % 10,
        new java.sql.Timestamp(0L), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp2/orders.parquet")
    val r2 = Resample.queries("stats_permutation_test")(spark, tmp2).head()
    assert(r2.getAs[Double]("diff_obs") == 0.0)
    assert(r2.getAs[Double]("p_value") == 1.0)
  }

  test("changepoint: planted level shift is found at the plant") {
    val tmp = Files.createTempDirectory("cpt").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int, j: Int) =
      new java.sql.Timestamp(t0.getTime + day * 86400000L + j * 1000L)
    // 10 days at 5 events/day, then 10 days at 50/day → the split
    // statistic peaks at the last low day (i = 10)
    val rows = (0 until 20).flatMap { day =>
      val n = if (day < 10) 5 else 50
      (0 until n).map(j =>
        (ts(day, j), (day * 100 + j).toLong, 1L, "view", 1.0, "{}"))
    }
    rows.toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Resample.queries("timeseries_changepoint")(spark, tmp).head()
    assert(r.getAs[java.sql.Date]("split_day").toString == "2024-01-10")
    assert(r.getAs[Double]("mean_before") == 5.0)
    assert(r.getAs[Double]("mean_after") == 50.0)
    assert(r.getAs[Double]("shift_stat") > 100.0)
  }

  test("decay sum: 30-day half-life halves a 30-day-old event") {
    val tmp = Files.createTempDirectory("decay").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val t30 = java.sql.Timestamp.valueOf("2024-01-31 00:00:00") // 30d older
    Seq((t0, 1L, 1L, "view", 1.0, "{}"), (t30, 2L, 1L, "view", 1.0, "{}"))
      .toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.operators.Aggregates.queries("agg_decay_sum")(spark, tmp)
      .head()
    assert(r.getAs[Long]("n_events") == 2L)
    assert(math.abs(r.getAs[Double]("decay_score") - 1.5) < 1e-6,
      r.toString)
  }

  test("seasonal anomaly: a planted same-weekday spike flags, steady " +
    "weekdays don't") {
    val tmp = Files.createTempDirectory("seas").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int, j: Int) =
      new java.sql.Timestamp(t0.getTime + day * 86400000L + j * 1000L)
    // 8 weeks; every day has 10 events except ONE spiked Wednesday (40)
    val rows = (0 until 56).flatMap { day =>
      val n = if (day == 30) 40 else 10
      (0 until n).map(j =>
        (ts(day, j), (day * 1000 + j).toLong, 1L, "view", 1.0, "{}"))
    }
    rows.toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.operators.Windows
      .queries("window_anomaly_seasonal")(spark, tmp).collect()
    val flagged = out.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length == 1, out.mkString("\n"))
    assert(flagged(0).getAs[java.sql.Date]("day").toString == "2024-01-31")
    assert(flagged(0).getAs[Long]("n_events") == 40L)
  }

  test("theil-sen: exact slope on a planted ramp, immune to one outlier " +
    "day") {
    val tmp = Files.createTempDirectory("sen").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int, j: Int) =
      new java.sql.Timestamp(t0.getTime + day * 86400000L + j * 1000L)
    // counts 2, 4, 6, ..., 40 over 20 days; day 10 spiked to 200
    val rows = (0 until 20).flatMap { day =>
      val n = if (day == 10) 200 else 2 * (day + 1)
      (0 until n).map(j =>
        (ts(day, j), (day * 1000 + j).toLong, 1L, "view", 1.0, "{}"))
    }
    rows.toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.operators.Stats.queries("stats_theil_sen")(spark, tmp)
      .head()
    assert(r.getAs[Long]("n_pairs") == 190L)
    assert(r.getAs[Double]("sen_slope") == 2.0, r.toString)
  }

  test("stl strength: a pure weekly pattern scores f_seasonal near 1") {
    val tmp = Files.createTempDirectory("stl").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int, j: Int) =
      new java.sql.Timestamp(t0.getTime + day * 86400000L + j * 1000L)
    // value total per day cycles hard with weekday (1x vs 8x), no trend
    val rows = (0 until 42).flatMap { day =>
      val n = if (day % 7 < 2) 80 else 10
      (0 until n).map(j =>
        (ts(day, j), (day * 1000 + j).toLong, 1L, "view", 1.0, "{}"))
    }
    rows.toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.operators.Stats
      .queries("timeseries_stl_strength")(spark, tmp).head()
    assert(r.getAs[Long]("n_days") > 30L)
    assert(r.getAs[Double]("f_seasonal") > 0.95, r.toString)
  }

  test("time to convert: planted deltas give the exact order statistics") {
    val tmp = Files.createTempDirectory("ttc").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def h(hours: Int) = new java.sql.Timestamp(t0.getTime + hours * 3600000L)
    // users 1/2/3 convert after 1h, 2h, 10h; user 4 never converts
    val rows = Seq(
      (h(0), 1L, 1L, "view", 1.0, "{}"), (h(1), 2L, 1L, "purchase", 1.0, "{}"),
      (h(0), 3L, 2L, "view", 1.0, "{}"), (h(2), 4L, 2L, "purchase", 1.0, "{}"),
      (h(0), 5L, 3L, "view", 1.0, "{}"), (h(10), 6L, 3L, "purchase", 1.0, "{}"),
      (h(0), 7L, 4L, "view", 1.0, "{}"))
    rows.toDF("ts", "event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.operators.Stats
      .queries("events_time_to_convert")(spark, tmp).head()
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_converted") == 3L)
    assert(r.getAs[Double]("conv_rate") == 0.75)
    assert(r.getAs[Long]("median_h") == 2L)
    assert(r.getAs[Long]("p90_h") == 10L)
  }
}
