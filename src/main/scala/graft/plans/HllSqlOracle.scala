package graft.plans

import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper

/** DuckDB-SQL replay of Spark's `approx_count_distinct` (HyperLogLog++)
  * — the sketch is deterministic end-to-end, so "approximate" does not
  * mean "unreplayable": the estimate is a pure function of the data.
  *
  * Faithfulness comes from three pieces, each pinned against the
  * engine itself rather than the paper:
  *  - the register update is `x = XXH64.hashLong(v, 42)`, `idx = x >>>
  *    (64-p)`, `rank = nlz((x << p) | 1<<(p-1)) + 1`, register max —
  *    read out of `HyperLogLogPlusPlusHelper.update`'s bytecode and
  *    validated by driving the helper directly on known inputs;
  *  - the estimator replays `query`'s exact branch structure: zInverse
  *    + zero-register count V, linear counting `m·ln(m/V)` when
  *    `(H <= threshold) || (e <= 2.5m)`, else the bias-corrected
  *    estimate `e - bias(e)` for `e < 5m`, finally `Math.round`
  *    (= floor(x+0.5));
  *  - `bias(e)` replays `estimateBias`'s k-nearest-neighbor walk over
  *    the HLL++ paper's appendix tables: insertion-point = COUNT(rev <
  *    e) on the distinct sorted table, window `[max(near-K+1,0), +K)`,
  *    then slide while the entering point is STRICTLY closer (squared
  *    distance) than the leaving one — replayed as min-k over an
  *    enumerated k scan (the greedy walk stops at the first failing k,
  *    which IS the minimal failing k). The tables and K are read from
  *    `HyperLogLogPlusPlusHelper`'s public statics at generation time,
  *    so they can never drift from the engine.
  *
  * Register-merge order cannot matter (max is commutative), so the
  * sketch is partition-invariant; the only engine-vs-oracle freedom is
  * double summation order in zInverse/bias, which is absorbed by the
  * final integer rounding (a flip would need the true value within an
  * ulp of a .5 boundary). Hash work is one chain per DISTINCT value,
  * not per row.
  */
object HllSqlOracle {
  import XxhSqlOracle.{M64, chain, h, hashLongStages}

  /** The agg_approx_distinct replay: `approx_count_distinct(valueCol,
    * rsd)` grouped by `groupCol` over `table`, emitted as `outCol`,
    * ordered by the group column. `valueCol` must be a BIGINT column
    * (the LongType hash path). */
  def approxCountDistinctSql(table: String, groupCol: String,
      valueCol: String, rsd: Double, outCol: String): String =
    estimateCtes(table, groupCol, valueCol, rsd) +
      s"""
         |SELECT grp AS $groupCol, CAST(floor(est + 0.5) AS BIGINT) AS $outCol
         |FROM finalest ORDER BY $groupCol""".stripMargin

  /** The agg_hll_sketch_merge replay: the UNION of per-group HLL++
    * sketches estimated as one total. Because the union is register max
    * — associative and commutative — unioning per-group sketches is
    * EXACTLY the global sketch, so the replay builds registers globally
    * (`groupExpr = "1"`); equality with the Spark side's explicit
    * two-stage (per-group build → union) pipeline is precisely the
    * union-correctness statement the oracle exists to check. */
  def hllUnionTotalSql(table: String, valueCol: String, rsd: Double,
      outCol: String, nRowsCol: String): String =
    estimateCtes(table, "1", valueCol, rsd) +
      s"""
         |SELECT CAST(floor(est + 0.5) AS BIGINT) AS $outCol,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $table) AS $nRowsCol
         |FROM finalest""".stripMargin

  private def estimateCtes(table: String, groupCol: String,
      valueCol: String, rsd: Double): String = {
    val p = math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt
    require(p >= 4 && p < 19, s"unsupported precision $p")
    val m = 1 << p
    // exactly the helper's alphaM2 for p >= 7 (smaller p uses fixed
    // constants — not needed at the suite's rsd)
    require(p >= 7, s"p=$p would need the fixed-alpha table")
    val alphaM2 = (0.7213d / (1.0d + 1.079d / m)) * m * m
    val threshold = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val bias = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val k = HyperLogLogPlusPlusHelper.K
    val n = raw.length
    val hl = hashLongStages("hv", "CAST(42 AS HUGEINT)", "vu")
    val (hlChain, hlLast) = chain("pk0", "hc", hl)
    // rank = nlz(w) + 1 as a pure-integer threshold ladder (w >= 2^(p-1)
    // by the wPadding OR, so rank <= 64-p+1 branches suffice; no
    // floating log2, which is ulp-unsafe at exact powers of two)
    val rankCase = (0 to (64 - p))
      .map(i => s"WHEN w >= ${h(BigInt(1) << (63 - i))} THEN ${i + 1}")
      .mkString("CASE ", " ", " END")
    val rawVals = raw.indices
      .map(i => s"($i, ${raw(i)}, ${bias(i)})").mkString(",\n    ")
    s"""WITH pk0 AS (
       |  SELECT DISTINCT $valueCol AS pkv,
       |    (CASE WHEN $valueCol < 0 THEN CAST($valueCol AS HUGEINT) + $M64
       |          ELSE CAST($valueCol AS HUGEINT) END) AS vu
       |  FROM $table),
       |$hlChain,
       |hx AS (SELECT pkv, hvx5 AS hu FROM $hlLast),
       |fp AS (SELECT DISTINCT $groupCol AS grp, $valueCol AS pkv FROM $table),
       |rr AS (
       |  SELECT fp.grp,
       |    CAST(hu // ${h(BigInt(1) << (64 - p))} AS BIGINT) AS idx,
       |    ((hu * ${h(BigInt(1) << p)}) % $M64) + ${h(BigInt(1) << (p - 1))} AS w
       |  FROM fp JOIN hx USING (pkv)),
       |regs AS (
       |  SELECT grp, idx, max($rankCase) AS mr
       |  FROM rr GROUP BY grp, idx),
       |agg AS (
       |  SELECT grp,
       |    SUM(1.0 / CAST(CAST(1 AS BIGINT) << mr AS DOUBLE))
       |      + ($m - count(*)) * 1.0 AS zinv,
       |    CAST($m - count(*) AS DOUBLE) AS v
       |  FROM regs GROUP BY grp),
       |est0 AS (SELECT grp, v, $alphaM2 / zinv AS e FROM agg),
       |rawtbl(i, rev, biasv) AS (VALUES
       |    $rawVals),
       |near AS (
       |  SELECT est0.grp, est0.v, est0.e,
       |    greatest((SELECT count(*) FROM rawtbl WHERE rev < est0.e)
       |             - ${k - 1}, 0) AS lo0
       |  FROM est0),
       |near2 AS (SELECT *, least(lo0 + $k, $n) AS hi0 FROM near),
       |kscan AS (
       |  SELECT near2.grp, ks.k,
       |    CASE WHEN near2.hi0 + ks.k >= $n THEN TRUE
       |         WHEN (rh.rev - near2.e) * (rh.rev - near2.e) >=
       |              (rl.rev - near2.e) * (rl.rev - near2.e) THEN TRUE
       |         ELSE FALSE END AS stop
       |  FROM near2
       |  CROSS JOIN (SELECT unnest(range(0, ${n + 1})) AS k) ks
       |  LEFT JOIN rawtbl rl ON rl.i = near2.lo0 + ks.k
       |  LEFT JOIN rawtbl rh ON rh.i = near2.hi0 + ks.k),
       |kstar AS (SELECT grp, min(k) AS ks FROM kscan WHERE stop GROUP BY grp),
       |biasof AS (
       |  SELECT near2.grp,
       |    (SELECT SUM(biasv) FROM rawtbl
       |      WHERE i >= near2.lo0 + kstar.ks AND i < near2.hi0 + kstar.ks)
       |      / (near2.hi0 - near2.lo0) AS bias
       |  FROM near2 JOIN kstar USING (grp)),
       |finalest AS (
       |  SELECT est0.grp,
       |    CASE WHEN est0.v > 0 THEN
       |      CASE WHEN $m * ln($m / est0.v) <= $threshold
       |                OR est0.e <= ${2.5d * m}
       |           THEN $m * ln($m / est0.v)
       |           WHEN est0.e < ${5.0d * m} THEN est0.e - b.bias
       |           ELSE est0.e END
       |    ELSE CASE WHEN est0.e < ${5.0d * m} THEN est0.e - b.bias
       |              ELSE est0.e END
       |    END AS est
       |  FROM est0 JOIN biasof b USING (grp))""".stripMargin
  }

  /** Scala replay of `HyperLogLogPlusPlusHelper.query` over an explicit
    * register table (idx → max rank) — the estimator for queries that
    * build/union HLL++ registers as DataFrame columns rather than
    * through approx_count_distinct. Mirrors the SQL replay above branch
    * for branch (linear counting gate, bias kNN walk, Math.round);
    * validated by hard equality with approx_count_distinct in
    * AggregatesSpec/OperatorSemanticsSpec parity tests. */
  def estimateFromRegisters(regs: Seq[(Long, Int)], rsd: Double): Long = {
    val p = math.ceil(2.0d * math.log(1.106d / rsd) / math.log(2.0d)).toInt
    require(p >= 7 && p < 19, s"unsupported precision $p")
    val m = 1 << p
    val alphaM2 = (0.7213d / (1.0d + 1.079d / m)) * m * m
    val v = (m - regs.size).toDouble
    // ascending-idx fold: a fixed, partition-independent sum order
    val zinv = regs.sortBy(_._1).map { case (_, mr) =>
      1.0 / (1L << mr).toDouble
    }.sum + v
    val e = alphaM2 / zinv
    val threshold = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
    val raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val biasT = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val k = HyperLogLogPlusPlusHelper.K
    val n = raw.length
    def bias: Double = {
      val ip = raw.count(_ < e)
      val lo0 = math.max(ip - (k - 1), 0)
      val hi0 = math.min(lo0 + k, n)
      var ks = 0
      def stop(kk: Int): Boolean = hi0 + kk >= n || {
        val rh = raw(hi0 + kk); val rl = raw(lo0 + kk)
        (rh - e) * (rh - e) >= (rl - e) * (rl - e)
      }
      while (!stop(ks)) ks += 1
      (lo0 + ks until hi0 + ks).map(biasT).sum / (hi0 - lo0)
    }
    val est =
      if (v > 0 && (m * math.log(m / v) <= threshold || e <= 2.5d * m))
        m * math.log(m / v)
      else if (e < 5.0d * m) e - bias
      else e
    Math.round(est)
  }
}
