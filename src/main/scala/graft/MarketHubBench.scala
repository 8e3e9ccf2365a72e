package graft

import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r13 item 8): exercise the copurchase support-
  * ceiling on a corpus with a REAL hub population. The synthetic
  * testdata is hub-free by construction (part support ~Poisson(30·sf)),
  * so the r13 leverage measurements could only show the knob's cost on
  * mild data (−5%), never the quadratic saving it exists for. This
  * fixture derives a hub-planted incidence table — `nHubs` synthetic
  * part ids present in EVERY order, the bestsellers-in-every-cart
  * shape — and measures pruned vs unpruned:
  *
  *  - pair-emission universe ([[graft.operators.Market
  *    .pairEmissionCount]] — the Generate's fan-out, the quantity the
  *    ceiling deletes up front via the broadcast-anti hub join);
  *  - wall time of the full ranked query, three passes each, min
  *    reported (the bench discipline).
  *
  * Usage: MarketHubBench [sfDir] [cpus] [nHubs]
  * Output: one JSON line for the BASELINE.md scale table.
  */
object MarketHubBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val nHubs = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    // hub ids far above the real part key space; one row per
    // (order, hub) — support = |orders| each
    val hubRows = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"))
      .crossJoin(spark.range(nHubs)
        .select((col("id") + lit(900000000L)).as("l_partkey")))
    val dp = li.unionByName(hubRows).localCheckpoint(true)
    val nOrders = hubRows.count() / nHubs
    // ceiling above every organic support (~30·sf0.1-scale Poisson)
    // but far below the planted |orders| hub support
    val ceiling = 1000L
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val emitUnpruned = graft.operators.Market.pairEmissionCount(dp)
    val emitPruned =
      graft.operators.Market.pairEmissionCount(dp, maxSupport = ceiling)
    def run(maxSupport: Long): Double =
      (1 to 3).map(_ => timed {
        graft.operators.Market.coPurchaseTopK(dp, k = 3,
            minSupport = 1L, maxSupport = maxSupport)
          .write.format("noop").mode("overwrite").save()
      }).min
    val tUnpruned = run(Long.MaxValue)
    val tPruned = run(ceiling)
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.2f",
      Double.box(v))
    println(s"""{"fixture":"market_hub","sf_dir":"$sfDir",""" +
      s""""n_hubs":$nHubs,"n_orders":$nOrders,"ceiling":$ceiling,""" +
      s""""pairs_emitted_unpruned":$emitUnpruned,""" +
      s""""pairs_emitted_pruned":$emitPruned,""" +
      s""""emit_collapse":${num(emitUnpruned.toDouble /
        math.max(emitPruned, 1L))},""" +
      s""""sec_unpruned":${num(tUnpruned)},""" +
      s""""sec_pruned":${num(tPruned)},""" +
      s""""speedup":${num(tUnpruned / tPruned)}}""")
    spark.stop()
  }
}
