package graft.ml

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** (row count, upper-triangle micro-sums) accumulator for [[Pca]]'s
  * one-pass covariance — element k holds Σ dec6(xᵢ·xⱼ) in 1e-6 units
  * for the k-th (i ≤ j) cell. Top-level + public: the Dataset encoder
  * is codegen'd into a different package, so a private nested class
  * fails Janino compilation. */
case class CovAcc(n: Long, s: Array[Long])

/** Top principal component of the embedding table by exact covariance
  * + bounded power iteration — the whitening/recentring primitive an
  * embedding pipeline runs before ANN indexing (dominant-direction
  * removal is the standard fix for anisotropic sentence embeddings).
  *
  * Two halves, same "statistics small, data big" split as [[Ridge]]:
  *
  *   1. '''Covariance''' (distributed): one typed Aggregator pass —
  *      each partition folds its vectors' d(d+1)/2 per-row-quantized
  *      products into a single Long micro-unit array, so the exchange
  *      carries ONE ~16 KB buffer per partition regardless of corpus
  *      size (the round-9 rewrite of the two-chained-posexplode form,
  *      which shuffled n·d(d+1)/2 product rows through a decimal hash
  *      aggregate: 6.2 → 0.65 s at sf0.1, 73 → 2.9 s at sf1). The
  *      per-row quantization reproduces Spark's double→DECIMAL(18,6)
  *      cast bit-for-bit (dec6Micro: shortest-string half-up,
  *      fast-pathed away from ties), and Long sums are associative —
  *      C stays partition-order invariant and oracle-identical.
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

  /** Spark's double→DECIMAL(18,6) cast as a micro-unit Long:
    * BigDecimal.valueOf rounds the double's SHORTEST DECIMAL STRING
    * half-up at scale 6. Fast path: when `x·1e6` is farther than 1e-8
    * from a rounding tie, the string and binary roundings provably
    * agree (the shortest-string value is within 1 ulp ≈ 1e-15 of x,
    * i.e. 1e-9 in micro units) and a plain floor(+0.5) suffices; the
    * BigDecimal is only built in the tie-adjacent sliver. */
  private def dec6Micro(x: Double): Long = {
    val y = x * 1e6
    val f = math.floor(y)
    val frac = y - f
    if (math.abs(frac - 0.5) > 1e-8) {
      if (frac >= 0.5) f.toLong + 1L else f.toLong
    } else {
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
  }


  /** One-pass covariance moments: each partition folds its vectors'
    * d(d+1)/2 quantized products into a single Long array, so the
    * exchange carries ONE ~16 KB buffer per partition instead of the
    * n·d(d+1)/2 exploded product rows the first implementation
    * shuffled through a decimal hash aggregate (measured 6.6 → ~1 s
    * at sf0.1, 73 → ~8 s at sf1). Long sums of the SAME per-row
    * quantization keep the result bit-identical to the decimal-sum
    * form (partition-order invariant by integer associativity). */
  private val covAgg = new org.apache.spark.sql.expressions
      .Aggregator[Array[Float], CovAcc, CovAcc] {
    def zero: CovAcc = CovAcc(0L, Array.fill(Dim * (Dim + 1) / 2)(0L))
    def reduce(b: CovAcc, e: Array[Float]): CovAcc = {
      require(e.length == Dim, s"embedding dim ${e.length} != $Dim")
      var i = 0; var k = 0
      while (i < Dim) {
        val xi = e(i).toDouble
        var j = i
        while (j < Dim) {
          b.s(k) += dec6Micro(xi * e(j).toDouble)
          k += 1; j += 1
        }
        i += 1
      }
      CovAcc(b.n + 1L, b.s)
    }
    def merge(a: CovAcc, b: CovAcc): CovAcc = {
      var k = 0
      while (k < a.s.length) { a.s(k) += b.s(k); k += 1 }
      CovAcc(a.n + b.n, a.s)
    }
    def finish(r: CovAcc): CovAcc = r
    def bufferEncoder: org.apache.spark.sql.Encoder[CovAcc] =
      org.apache.spark.sql.Encoders.product[CovAcc]
    def outputEncoder: org.apache.spark.sql.Encoder[CovAcc] =
      org.apache.spark.sql.Encoders.product[CovAcc]
  }

  /** Spark `round(x·1e6)/1e6` (U.round6) on the driver: Round on a
    * double is BigDecimal-string half-up at scale 0. */
  private def round6Spark(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue() / 1e6

  private def covUpper(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // per-dim means: one narrow explode (n·d rows), exact decimal sums
    val mu = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(
        count(lit(1)).as("n"),
        (U.dbl(sum(U.dec6(col("x").cast("double")))) / count(lit(1)))
          .as("mu"))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val sess = s; import sess.implicits._
    val acc = emb.select(col("embedding")).as[Array[Float]]
      .select(covAgg.toColumn).head()
    val n = acc.n.toDouble
    val rows = for {
      i <- 0 until Dim; j <- i until Dim
    } yield {
      val k = i * Dim - i * (i - 1) / 2 + (j - i)
      val sxy = acc.s(k).toDouble / 1e6
      (i.toLong, j.toLong, round6Spark(sxy / n - mu(i) * mu(j)))
    }
    rows.toDF("i", "j", "c")
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
