package graft.ml

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-split tree diagnostics — the two cheapest questions to ask
  * of a labeled corpus before training anything bigger: which single
  * threshold on a feature best separates the classes (decision stump,
  * the base learner of boosting), and how much information a
  * bucketized feature carries about the label at all (mutual
  * information, the model-free screen).
  *
  * Both are pure "statistics small, data big" shapes: ONE
  * map-side-combined aggregate collapses the corpus to a bounded
  * grid (32 bins / |bins|×|labels| cells), and everything after —
  * cumulative class counts, impurity arithmetic, the argmax — runs
  * over those bounded rows (windows sit above the aggregate, per the
  * plan-hygiene rule). Exhaustive split search over d features is d
  * such aggregates, embarrassingly parallel.
  *
  * Determinism: bin edges come from one (min, max) aggregate of exact
  * doubles; bin ids are integer floor arithmetic spelled
  * token-for-token like the oracle; counts are longs; the only
  * transcendental (ln in MI) quantizes per CELL through [[U.dec6r]]
  * before the exact decimal sum.
  *
  * Reference ancestry: none — beyond-reference ML surface.
  */
object Stump {
  private val Bins = 32
  private val MiBins = 16

  /** label y (lang = 'en') and the char-length feature, plus the
    * corpus (min, max) broadcast — shared by both queries. */
  private def binned(s: SparkSession, d: String, bins: Int): DataFrame = {
    val docs = Tables.t(s, d, "documents").select(
      when(col("lang") === "en", 1L).otherwise(0L).as("y"),
      length(col("text")).cast("double").as("x"))
    val mm = docs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    // Degenerate-range guard (every x identical → mx = mn): the
    // unguarded ratio is 0/0 = NaN, which Spark floors to null but
    // DuckDB's CAST raises on — bin 0 on BOTH engines instead.
    docs.crossJoin(broadcast(mm))
      .withColumn("bin", when(col("mx") === col("mn"), lit(0))
        .otherwise(least(lit(bins - 1),
          floor((col("x") - col("mn")) / (col("mx") - col("mn"))
            * bins).cast("int"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Best single threshold by Gini impurity reduction: per-bin class
    // counts (the one data-scaled aggregate), prefix sums over the 32
    // bins, gain at every candidate split, argmax with a deterministic
    // threshold tiebreak. Output: the chosen threshold, its gain, and
    // the two leaf majorities.
    "ml_decision_stump" -> ((s, d) => {
      val perBin = binned(s, d, Bins)
        .groupBy("bin", "mn", "mx")
        .agg(sum(col("y")).as("p"),
          sum(lit(1L) - col("y")).as("q"))
      val w = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perBin
        .withColumn("cp", sum(col("p")).over(w))
        .withColumn("cq", sum(col("q")).over(w))
      val tot = perBin.groupBy("mn", "mx")
        .agg(sum(col("p")).as("tp"), sum(col("q")).as("tq"))
      val sp = cum.join(broadcast(tot), Seq("mn", "mx"))
        .withColumn("nl", (col("cp") + col("cq")).cast("double"))
        .withColumn("nr",
          (col("tp") + col("tq") - col("cp") - col("cq")).cast("double"))
        .filter(col("nl") > 0.0 && col("nr") > 0.0)
      def gini(p: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) = {
        val f = p.cast("double") / n
        lit(1.0) - f * f - (lit(1.0) - f) * (lit(1.0) - f)
      }
      val n = (col("tp") + col("tq")).cast("double")
      val gain = gini(col("tp"), n) -
        (col("nl") / n) * gini(col("cp"), col("nl")) -
        (col("nr") / n) * gini(col("tp") - col("cp"), col("nr"))
      sp.withColumn("gain", gain)
        .withColumn("threshold", col("mn") +
          (col("bin") + 1).cast("double")
            * (col("mx") - col("mn")) / Bins)
        .orderBy(col("gain").desc, col("threshold").asc)
        .limit(1)
        .select(
          U.round6(col("threshold")).as("threshold"),
          U.round6(col("gain")).as("gini_gain"),
          col("cp").geq(col("cq")).as("left_majority_en"),
          (col("tp") - col("cp")).geq(col("tq") - col("cq"))
            .as("right_majority_en"),
          (col("cp") + col("cq")).as("n_left"),
          (col("tp") + col("tq") - col("cp") - col("cq")).as("n_right"))
    }),

    // Mutual information (nats) between the 16-bin char-length feature
    // and the language label: I = Σ p(b,l)·ln(p(b,l)/(p(b)p(l))) over
    // the bounded cell grid. Cell terms are ln over exact-integer
    // ratios — quantized per cell (U.dec6r) so the sum over cells is
    // partition-order- and engine-invariant.
    "ml_mutual_info" -> ((s, d) => {
      val docs = Tables.t(s, d, "documents").select(
        col("lang"), length(col("text")).cast("double").as("x"))
      val mm = docs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val cells = docs.crossJoin(broadcast(mm))
        .withColumn("bin", when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(MiBins - 1),
            floor((col("x") - col("mn")) / (col("mx") - col("mn"))
              * MiBins).cast("int"))))
        .groupBy("bin", "lang").agg(count(lit(1)).as("c"))
      val rowTot = cells.groupBy("bin").agg(sum(col("c")).as("rb"))
      val colTot = cells.groupBy("lang").agg(sum(col("c")).as("cl"))
      val n = cells.agg(sum(col("c")).as("n"))
      val term = (col("c").cast("double") / col("n")) *
        log((col("c").cast("double") * col("n"))
          / (col("rb") * col("cl")).cast("double"))
      cells.join(broadcast(rowTot), "bin")
        .join(broadcast(colTot), "lang")
        .crossJoin(broadcast(n))
        .agg(count(lit(1)).as("n_cells"),
          sum(U.dec6r(term)).cast("double").as("mi0"))
        .select(col("n_cells"), U.round6(col("mi0")).as("mi_nats"))
    })
  )

  private def binSql(bins: Int): String =
    s"""CASE WHEN mx = mn THEN 0
       |      ELSE least(${bins - 1}, CAST(floor((x - mn) / (mx - mn)
       |      * $bins) AS INTEGER)) END""".stripMargin

  val oracles: Map[String, String] = Map(
    "ml_decision_stump" ->
      s"""WITH docs AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |    CAST(length(text) AS DOUBLE) AS x
         |  FROM documents),
         |mm AS (SELECT min(x) AS mn, max(x) AS mx FROM docs),
         |pb AS (
         |  SELECT ${binSql(Bins)} AS bin, mn, mx,
         |    CAST(SUM(y) AS BIGINT) AS p,
         |    CAST(SUM(1 - y) AS BIGINT) AS q
         |  FROM docs, mm GROUP BY 1, 2, 3),
         |cum AS (
         |  SELECT bin, mn, mx, p, q,
         |    SUM(p) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         |    SUM(q) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq
         |  FROM pb),
         |tot AS (SELECT CAST(SUM(p) AS BIGINT) AS tp,
         |  CAST(SUM(q) AS BIGINT) AS tq FROM pb),
         |sp AS (
         |  SELECT bin, mn, mx, cp, cq, tp, tq,
         |    CAST(cp + cq AS DOUBLE) AS nl,
         |    CAST(tp + tq - cp - cq AS DOUBLE) AS nr,
         |    CAST(tp + tq AS DOUBLE) AS n
         |  FROM cum, tot
         |  WHERE cp + cq > 0 AND tp + tq - cp - cq > 0),
         |gn AS (
         |  SELECT *,
         |    (1.0 - (CAST(tp AS DOUBLE) / n) * (CAST(tp AS DOUBLE) / n)
         |      - (1.0 - CAST(tp AS DOUBLE) / n)
         |        * (1.0 - CAST(tp AS DOUBLE) / n))
         |    - (nl / n) * (1.0 - (CAST(cp AS DOUBLE) / nl)
         |        * (CAST(cp AS DOUBLE) / nl)
         |      - (1.0 - CAST(cp AS DOUBLE) / nl)
         |        * (1.0 - CAST(cp AS DOUBLE) / nl))
         |    - (nr / n) * (1.0 - (CAST(tp - cp AS DOUBLE) / nr)
         |        * (CAST(tp - cp AS DOUBLE) / nr)
         |      - (1.0 - CAST(tp - cp AS DOUBLE) / nr)
         |        * (1.0 - CAST(tp - cp AS DOUBLE) / nr)) AS gain,
         |    mn + CAST(bin + 1 AS DOUBLE) * (mx - mn) / $Bins
         |      AS threshold
         |  FROM sp)
         |SELECT round(threshold * 1000000) / 1000000 AS threshold,
         |  round(gain * 1000000) / 1000000 AS gini_gain,
         |  cp >= cq AS left_majority_en,
         |  tp - cp >= tq - cq AS right_majority_en,
         |  CAST(cp + cq AS BIGINT) AS n_left,
         |  CAST(tp + tq - cp - cq AS BIGINT) AS n_right
         |FROM gn ORDER BY gain DESC, threshold ASC LIMIT 1""".stripMargin,
    "ml_mutual_info" ->
      s"""WITH docs AS (
         |  SELECT lang, CAST(length(text) AS DOUBLE) AS x
         |  FROM documents),
         |mm AS (SELECT min(x) AS mn, max(x) AS mx FROM docs),
         |cells AS (
         |  SELECT ${binSql(MiBins)} AS bin, lang,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM docs, mm GROUP BY 1, 2),
         |rt AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS rb
         |       FROM cells GROUP BY bin),
         |ct AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl
         |       FROM cells GROUP BY lang),
         |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
         |tm AS (
         |  SELECT (CAST(c AS DOUBLE) / n)
         |      * ln((CAST(c AS DOUBLE) * n) / CAST(rb * cl AS DOUBLE))
         |      AS term
         |  FROM cells JOIN rt USING (bin) JOIN ct USING (lang), nn)
         |SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |  round(CAST(SUM(CAST(round(term * 1000000) / 1000000
         |      AS DECIMAL(18,6))) AS DOUBLE) * 1000000) / 1000000
         |    AS mi_nats
         |FROM tm""".stripMargin
  )
}
