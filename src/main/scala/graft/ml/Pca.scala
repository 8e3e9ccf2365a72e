package graft.ml

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component of the embedding table by exact covariance
  * + bounded power iteration — the whitening/recentring primitive an
  * embedding pipeline runs before ANN indexing (dominant-direction
  * removal is the standard fix for anisotropic sentence embeddings).
  *
  * Two halves, same "statistics small, data big" split as [[Ridge]]:
  *
  *   1. '''Covariance''' (distributed): each vector emits its d(d+1)/2
  *      upper-triangle products via two chained posexplodes — row
  *      EXPLOSION, not a self-join, so there is NO shuffle before the
  *      (i, j) aggregation and map-side partial aggregation collapses
  *      every partition to ≤ d² rows. The only shuffle in the plan
  *      carries ~d²·partitions partial sums regardless of corpus size.
  *      Products sum through DECIMAL(18,6) (the ACF discipline), so
  *      C is partition-order invariant; each C_ij rounds to 1e-6.
  *
  *   2. '''Power iteration''' (driver, dimension-bounded): the d×d
  *      matrix (d = 64 here — bounded by the EMBEDDING DIMENSION, not
  *      the data; same guarded-collect rule as the PageRank type graph
  *      and the IVF centroid memo) iterates v ← C·v / ‖C·v‖ three
  *      times from the deterministic start v₀ = 1/√d. Every dot
  *      product accumulates half-away-from-zero-rounded 1e-6
  *      micro-units in Long — exact integer sums, so the loop is
  *      order-invariant and replays token-for-token in the oracle's
  *      three unrolled SQL stages (micro-rounding matches DuckDB's
  *      `round()`, which rounds the BINARY double half away from
  *      zero).
  *
  * The third iterate's norm is the eigenvalue estimate (it converges
  * to λ₁ as the iterate aligns; the bounded-round contract reports
  * exactly the 3-step value, which is what the oracle unrolls).
  *
  * Reference ancestry: none — beyond-reference engine surface.
  */
object Pca {

  private val Dim = 64
  private val Iters = 3

  /** DuckDB `round()` semantics on the binary double: half away from
    * zero, at 1e-6. Used for every driver-side rounding so the loop
    * and the SQL replay see identical values. */
  private def r6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** Micro-unit (1e-6) integer of x, half away from zero. */
  private def micro(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5)).toLong

  /** Upper-triangle covariance rows (i ≤ j, C_ij rounded 1e-6):
    * C = E[x_i·x_j] − μ_i·μ_j (population form, n divisor). The
    * per-dim sums come from ONE single-level explode (n·d rows → d
    * rows, broadcast back onto the pair cells) instead of being
    * re-summed per cell — exact decimal sums make sx/n ≡ μ_i
    * bit-identically, so the oracle's per-cell form replays the same
    * doubles while the engine's pair pass carries a single decimal
    * sum per cell (measured 15.0 → ~8 s at sf0.1). */
  private def covUpper(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val mu = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(
        count(lit(1)).as("n"),
        (U.dbl(sum(U.dec6(col("x").cast("double")))) / count(lit(1)))
          .as("mu"))
    val a = emb.select(col("embedding").as("e"),
      posexplode(col("embedding")).as(Seq("i", "xi")))
    val b = a.select(col("i"), col("xi").cast("double").as("xi"),
      posexplode(col("e")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"), col("xi"),
        col("xj").cast("double").as("xj"))
    val sxy = b.groupBy("i", "j").agg(
      count(lit(1)).as("n"),
      U.dbl(sum(U.dec6(col("xi") * col("xj")))).as("sxy"))
    sxy
      .join(broadcast(mu.select(col("i"), col("mu").as("mu_i"))),
        Seq("i"))
      .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mu_j"))),
        Seq("j"))
      .select(col("i").cast("long").as("i"),
        col("j").cast("long").as("j"),
        U.round6(col("sxy") / col("n") - col("mu_i") * col("mu_j"))
          .as("c"))
  }

  /** Collect the (dimension-bounded) covariance and run the
    * micro-unit power iteration; returns (v, λ-estimate). */
  private def powerIterate(cov: Array[(Int, Int, Double)])
      : (Array[Double], Double) = {
    val m = Array.ofDim[Double](Dim, Dim)
    cov.foreach { case (i, j, c) => m(i)(j) = c; m(j)(i) = c }
    var v = Array.fill(Dim)(r6(1.0 / math.sqrt(Dim.toDouble)))
    var lambda = 0.0
    for (_ <- 1 to Iters) {
      val w = Array.tabulate(Dim) { i =>
        var acc = 0L
        var j = 0
        while (j < Dim) { acc += micro(m(i)(j) * v(j)); j += 1 }
        acc / 1e6
      }
      var n2 = 0L
      var i = 0
      while (i < Dim) { n2 += micro(w(i) * w(i)); i += 1 }
      lambda = math.sqrt(n2 / 1e6)
      v = w.map(x => r6(x / lambda))
    }
    (v, r6(lambda))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_pca_power" -> ((s, d) => {
      val cov = covUpper(s, d).collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
      require(cov.length == Dim * (Dim + 1) / 2,
        s"covariance is ${cov.length} cells — embedding dim is not $Dim")
      val (v, lambda) = powerIterate(cov)
      val sess = s; import sess.implicits._
      v.zipWithIndex
        .map { case (x, i) => (i.toLong, x, lambda) }.toSeq
        .toDF("dim_idx", "loading", "eigenvalue_est")
        .orderBy("dim_idx")
    }))

  private def matvec(inV: String, outW: String, outV: String,
      stage: Int): String =
    s"""$outW AS (
      |  SELECT c.i,
      |    CAST(sum(CAST(round(c.c * v.v * 1000000) AS BIGINT)) AS DOUBLE)
      |      / 1000000 AS w
      |  FROM covfull c JOIN $inV v ON v.i = c.j GROUP BY c.i),
      |nrm$stage AS (
      |  SELECT sqrt(CAST(sum(CAST(round(w * w * 1000000) AS BIGINT))
      |    AS DOUBLE) / 1000000) AS nrm FROM $outW),
      |$outV AS (
      |  SELECT i, round(w / nrm * 1000000) / 1000000 AS v
      |  FROM $outW, nrm$stage)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ml_pca_power" ->
      s"""WITH dims AS (SELECT unnest(range(0, $Dim)) AS i),
        |inst AS (
        |  SELECT di.i AS i, dj.i AS j,
        |    CAST(embedding[di.i + 1] AS DOUBLE) AS xi,
        |    CAST(embedding[dj.i + 1] AS DOUBLE) AS xj
        |  FROM embeddings, dims di, dims dj WHERE dj.i >= di.i),
        |mom AS (
        |  SELECT i, j, count(*) AS n,
        |    CAST(sum(CAST(xi * xj AS DECIMAL(18, 6))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(xi AS DECIMAL(18, 6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(xj AS DECIMAL(18, 6))) AS DOUBLE) AS sy
        |  FROM inst GROUP BY i, j),
        |cov AS (
        |  SELECT i, j, round((sxy / n - (sx / n) * (sy / n)) * 1000000)
        |    / 1000000 AS c
        |  FROM mom),
        |covfull AS (
        |  SELECT i, j, c FROM cov
        |  UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i <> j),
        |v0 AS (SELECT i, round(1.0 / sqrt(${Dim}.0) * 1000000) / 1000000
        |       AS v FROM dims),
        |${matvec("v0", "w1", "v1", 1)},
        |${matvec("v1", "w2", "v2", 2)},
        |${matvec("v2", "w3", "v3", 3)}
        |SELECT CAST(v3.i AS BIGINT) AS dim_idx, v3.v AS loading,
        |  round(nrm * 1000000) / 1000000 AS eigenvalue_est
        |FROM v3, nrm3 ORDER BY dim_idx""".stripMargin)
}
