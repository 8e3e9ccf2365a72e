package graft

/** Dev helper main: execute one registered query through the noop sink and
  * print the FINAL adaptive plan's exchange/scan lines — the static
  * `explain` shows the pre-AQE plan, which hides runtime ReusedExchange.
  */
object RunPlanDev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    // Execute THIS df's QueryExecution (a noop write or foreachPartition
    // plans a fresh one), so the printed adaptive plan is the final,
    // stage-reused one. collect() is fine: this is a dev tool run on
    // registered queries, whose results are small by construction.
    df.collect()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("QueryStage") || l.contains("isFinalPlan") ||
        l.contains("AQEShuffleRead"))
      .mkString("\n"))
    spark.stop()
  }
}
