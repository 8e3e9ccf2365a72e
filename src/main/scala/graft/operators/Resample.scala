package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, U}

/** Resampling inference + change detection — the uncertainty layer a
  * corpus pipeline reports next to its point estimates: how stable is
  * this mean under resampling (bootstrap CI), is the gap between two
  * slices real or assignment noise (randomization test), and where did
  * the daily volume regime shift (changepoint).
  *
  * Every operator here is built on the SINGLE-PASS, shuffle-light
  * resampling designs that survive 100 TB — never "draw B samples":
  *
  *   - **Poisson bootstrap** (the scale-out bootstrap): each row
  *     contributes `k ~ Poisson(1)` copies to each replicate, with `k`
  *     drawn from ONE BYTE of a per-row deterministic hash (two md5
  *     evaluations yield all B replicates' draws) via inverse-CDF
  *     thresholds. One map-side explode (×B), one B-group aggregate
  *     (partial-agg collapses each partition to B rows before the
  *     exchange) — no data-scaled shuffle, no row-index coordination,
  *     reproducible on any engine byte-for-byte. The hash→Poisson
  *     bridge compares HEX substrings against precomputed threshold
  *     literals (floor(CDF·256) in hex), so no engine-specific
  *     hex→int conversion is ever needed.
  *   - **Randomization test**: group labels are re-dealt per replicate
  *     by an md5 coin (the same deterministic bridge as the engine's
  *     hash-sampling family, `stats_ab_lift` precedent), i.e. the
  *     binomial randomization variant of the permutation test — the
  *     variant that needs NO global label shuffle, which is what makes
  *     it the distributed form (a true permutation serializes on a
  *     global random order).
  *   - **Changepoint**: the CUSUM-style split statistic runs over the
  *     per-day AGGREGATE (bounded by the calendar, not the data), so
  *     its unpartitioned windows satisfy the repo's above-an-aggregate
  *     hygiene rule; the only data-scaled stage is the day rollup
  *     (map-side combined).
  *
  * All sums that feed cross-engine-compared numbers are quantized to
  * DECIMAL(18,6) before aggregation (partition-order invariance, the
  * `U.dec6` house discipline); doubles appear only in per-row closed-
  * form math over those exact sums, rounded at 1e-6 for display.
  *
  * Reference ancestry: none — beyond-reference statistical surface
  * (SURVEY §2 Part B training-data-pipeline extensions).
  */
object Resample {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** floor(CDF_Poisson(1)(k)·256) as 2-hex-digit lowercase literals,
    * k = 0..3; one BYTE of hash entropy per (row, replicate) draw. The
    * 8-bit quantization (and the k≥4 tail lumped at byte 0xff) is a
    * SHARED definition both engines evaluate identically — resampling
    * weights need unbiased-enough randomness, not cryptographic
    * resolution, and one byte per draw is what lets ALL replicates
    * derive from two md5 evaluations per row instead of one per
    * (row, replicate): measured 6.3 s → sub-second at sf0.1, a 16×
    * hash-count cut that dominates this operator's cost at scale. */
  private val poissonHex = Seq("5e", "bc", "eb", "fb")

  private def poissonWeight(h: Column): Column =
    poissonHex.zipWithIndex.foldRight(lit(4): Column) {
      case ((thr, k), rest) => when(h < thr, k).otherwise(rest)
    }

  private def poissonWeightSql(h: String): String =
    poissonHex.zipWithIndex
      .map { case (thr, k) => s"WHEN $h < '$thr' THEN $k" }
      .mkString("CASE ", " ", " ELSE 4 END")

  private val B_BOOT = 32
  private val B_PERM = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Poisson-bootstrap CI of mean(o_totalprice): explode ×32 map-side,
    // weight per (order, replicate) from the md5 bridge, one 32-group
    // weighted aggregate, then the 32 replicate means (bounded) sort
    // into a trimmed CI (drop min/max → the 30/32 ≈ 94% interval; a
    // fixed-rank definition both engines index identically, immune to
    // quantile-interpolation dialects).
    "stats_bootstrap_ci" -> ((s, d) => {
      val base = t(s, d, "orders").select(
        col("o_orderkey").cast("string").as("k"),
        U.dec6(col("o_totalprice")).as("x"))
        .withColumn("h64", concat(md5(col("k")),
          md5(concat(col("k"), lit("~")))))
      val h = substring(col("h64"), col("b") * 2 + 1, lit(2))
      // Keyed parallelizing exchange (r18; was round-robin U.fan + its
      // SPARK-23207 pre-shuffle sort): the ×B explode below multiplies
      // work BEFORE the first exchange — without it the whole resample
      // runs on the single scan task. The unique order key spreads
      // evenly.
      val rm = base.repartition(col("k"))
        .select(col("h64"), col("x"),
          explode(sequence(lit(0), lit(B_BOOT - 1))).as("b"))
        .select(col("b"), col("x"), poissonWeight(h).as("w"))
        .groupBy("b")
        .agg((sum(col("w") * col("x")).cast("double") / sum(col("w")))
          .as("rep_mean"))
      val arr = rm.agg(
        sort_array(collect_list(col("rep_mean"))).as("a"),
        count(lit(1)).as("b_reps"))
      val obs = base.agg(
        count(lit(1)).as("n"),
        (sum(col("x")).cast("double") / count(lit(1))).as("m"))
      obs.crossJoin(arr).select(
        col("n"),
        U.round6(col("m")).as("mean_x"),
        U.round6(element_at(col("a"), 2)).as("ci_lo"),
        U.round6(element_at(col("a"), B_BOOT - 1)).as("ci_hi"),
        col("b_reps"))
    }),

    // Randomization test for mean(o_totalprice): URGENT vs HIGH orders.
    // 64 deterministic label re-deals via the md5 coin; each replicate's
    // group means come from one conditional decimal aggregate (64 rows
    // out of the exchange), p = (1 + #{|diff_b| ≥ |diff_obs|})/(B+1)
    // (the add-one form — the observed deal is itself a deal).
    "stats_permutation_test" -> ((s, d) => {
      val base = t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey").cast("string").as("k"),
          U.dec6(col("o_totalprice")).as("x"),
          (col("o_orderpriority") === "1-URGENT").as("is_u"))
      val obs = base.agg(
        sum(when(col("is_u"), 1L).otherwise(0L)).as("n_urgent"),
        sum(when(!col("is_u"), 1L).otherwise(0L)).as("n_high"),
        (sum(when(col("is_u"), col("x"))).cast("double")
          / sum(when(col("is_u"), 1L).otherwise(0L))
          - sum(when(!col("is_u"), col("x"))).cast("double")
          / sum(when(!col("is_u"), 1L).otherwise(0L))).as("diff_obs"))
      val coin = substring(col("h64"), col("b") + 1, lit(1))
      // keyed exchange (r18) — same rationale as the bootstrap above
      val diffs = base
        .withColumn("h64", concat(md5(col("k")),
          md5(concat(col("k"), lit("~")))))
        .repartition(col("k"))
        .select(col("h64"), col("x"),
          explode(sequence(lit(0), lit(B_PERM - 1))).as("b"))
        .select(col("b"), col("x"), (coin < "8").as("a"))
        .groupBy("b")
        .agg((sum(when(col("a"), col("x"))).cast("double")
          / sum(when(col("a"), 1L).otherwise(0L))
          - sum(when(!col("a"), col("x"))).cast("double")
          / sum(when(!col("a"), 1L).otherwise(0L))).as("diff_b"))
      val tail = diffs.crossJoin(broadcast(obs)).agg(
        first(col("n_urgent")).as("n_urgent"),
        first(col("n_high")).as("n_high"),
        first(col("diff_obs")).as("dobs"),
        count(lit(1)).as("b_reps"),
        sum(when(abs(col("diff_b")) >= abs(col("diff_obs")), 1L)
          .otherwise(0L)).as("exceed"))
      tail.select(
        col("n_urgent"), col("n_high"),
        U.round6(col("dobs")).as("diff_obs"),
        col("b_reps"), col("exceed"),
        U.round6((col("exceed") + lit(1)).cast("double")
          / lit(B_PERM + 1.0)).as("p_value"))
    }),

    // Level-1 binary-segmentation changepoint over the daily event
    // count series: for every split position i the scaled mean-shift
    // statistic |μ_L − μ_R|·√(i·(n−i)/n), argmax with a deterministic
    // day tiebreak. Day rollup is the only data-scaled stage; the
    // cumulative/split scan runs over ≤ calendar-many rows.
    "timeseries_changepoint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy("day")
      val o = daily
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("i", row_number().over(w))
      val tot = daily.agg(sum(col("c")).as("tot"), count(lit(1)).as("nd"))
      val st = o.crossJoin(broadcast(tot))
        .filter(col("i") < col("nd"))
        .withColumn("mean_l", col("cum").cast("double") / col("i"))
        .withColumn("mean_r", (col("tot") - col("cum")).cast("double")
          / (col("nd") - col("i")))
        .withColumn("stat",
          abs(col("mean_l") - col("mean_r"))
            * sqrt((col("i") * (col("nd") - col("i"))).cast("double")
              / col("nd")))
      st.orderBy(col("stat").desc, col("day").asc)
        .limit(1)
        .select(col("day").as("split_day"),
          U.round6(col("stat")).as("shift_stat"),
          U.round6(col("mean_l")).as("mean_before"),
          U.round6(col("mean_r")).as("mean_after"))
    })
  )

  val oracles: Map[String, String] = Map(
    "stats_bootstrap_ci" ->
      s"""WITH base AS (
         |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
         |    CAST(o_totalprice AS DECIMAL(18,6)) AS x
         |  FROM orders),
         |hs AS (SELECT x, md5(k) || md5(k || '~') AS h64 FROM base),
         |reps AS (SELECT unnest(range(0, $B_BOOT)) AS b),
         |hashed AS (
         |  SELECT b, x,
         |    substring(h64, CAST(b * 2 + 1 AS INTEGER), 2) AS h
         |  FROM hs, reps),
         |rm AS (
         |  SELECT b,
         |    CAST(SUM((${poissonWeightSql("h")}) * x) AS DOUBLE)
         |      / SUM(${poissonWeightSql("h")}) AS rep_mean
         |  FROM hashed GROUP BY b),
         |arr AS (SELECT list_sort(list(rep_mean)) AS a,
         |  CAST(count(*) AS BIGINT) AS b_reps FROM rm),
         |obs AS (SELECT count(*) AS n,
         |  CAST(SUM(x) AS DOUBLE) / count(*) AS m FROM base)
         |SELECT obs.n, round(obs.m * 1e6) / 1e6 AS mean_x,
         |  round(a[2] * 1e6) / 1e6 AS ci_lo,
         |  round(a[${B_BOOT - 1}] * 1e6) / 1e6 AS ci_hi, b_reps
         |FROM obs, arr""".stripMargin,
    "stats_permutation_test" ->
      s"""WITH base AS (
         |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
         |    CAST(o_totalprice AS DECIMAL(18,6)) AS x,
         |    o_orderpriority = '1-URGENT' AS is_u
         |  FROM orders
         |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
         |obs AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN is_u THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_urgent,
         |    CAST(SUM(CASE WHEN NOT is_u THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_high,
         |    CAST(SUM(CASE WHEN is_u THEN x END) AS DOUBLE)
         |        / SUM(CASE WHEN is_u THEN 1 ELSE 0 END)
         |      - CAST(SUM(CASE WHEN NOT is_u THEN x END) AS DOUBLE)
         |        / SUM(CASE WHEN NOT is_u THEN 1 ELSE 0 END) AS dobs
         |  FROM base),
         |hs AS (SELECT x, md5(k) || md5(k || '~') AS h64 FROM base),
         |reps AS (SELECT unnest(range(0, $B_PERM)) AS b),
         |dealt AS (
         |  SELECT b, x,
         |    substring(h64, CAST(b + 1 AS INTEGER), 1) < '8' AS a
         |  FROM hs, reps),
         |diffs AS (
         |  SELECT b,
         |    CAST(SUM(CASE WHEN a THEN x END) AS DOUBLE)
         |        / SUM(CASE WHEN a THEN 1 ELSE 0 END)
         |      - CAST(SUM(CASE WHEN NOT a THEN x END) AS DOUBLE)
         |        / SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS diff_b
         |  FROM dealt GROUP BY b),
         |tl AS (
         |  SELECT any_value(n_urgent) AS n_urgent,
         |    any_value(n_high) AS n_high, any_value(dobs) AS dobs,
         |    CAST(count(*) AS BIGINT) AS b_reps,
         |    CAST(SUM(CASE WHEN abs(diff_b) >= abs(dobs)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS exceed
         |  FROM diffs, obs)
         |SELECT n_urgent, n_high, round(dobs * 1e6) / 1e6 AS diff_obs,
         |  b_reps, exceed,
         |  round((exceed + 1) / ${(B_PERM + 1).toDouble} * 1e6) / 1e6
         |    AS p_value
         |FROM tl""".stripMargin,
    "timeseries_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |o AS (
        |  SELECT day, c,
        |    sum(c) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY day) AS i
        |  FROM daily),
        |tot AS (SELECT sum(c) AS tot, count(*) AS nd FROM daily),
        |st AS (
        |  SELECT day,
        |    CAST(cum AS DOUBLE) / i AS mean_l,
        |    CAST(tot - cum AS DOUBLE) / (nd - i) AS mean_r,
        |    abs(CAST(cum AS DOUBLE) / i
        |        - CAST(tot - cum AS DOUBLE) / (nd - i))
        |      * sqrt(CAST(i * (nd - i) AS DOUBLE) / nd) AS stat
        |  FROM o, tot WHERE i < nd)
        |SELECT day AS split_day,
        |  round(stat * 1e6) / 1e6 AS shift_stat,
        |  round(mean_l * 1e6) / 1e6 AS mean_before,
        |  round(mean_r * 1e6) / 1e6 AS mean_after
        |FROM st ORDER BY stat DESC, day LIMIT 1""".stripMargin
  )
}
