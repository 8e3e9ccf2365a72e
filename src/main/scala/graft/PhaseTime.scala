package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r17): decompose a query's wall time into driver phases —
  * DataFrame construction (incl. parquet footer/schema reads),
  * analysis+optimization+physical planning, and execution (incl. the
  * AQE stage loop) — the feedback loop for the round-17 finding that
  * most of the suite's wall time is NOT task execution (sum over the
  * r16 record: 281 s wall vs ~60 s of task-time/32 — the rest is
  * driver-side).
  *
  * Usage: PhaseTime [sfDir] [cpus] [query ...]  (no queries = all)
  * Each query runs twice back-to-back (bench protocol); the SECOND
  * run's phases are reported so one-time classload/codegen lands in
  * the warm-up, mirroring Bench's min-of-2.
  */
object PhaseTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val only = args.drop(2).toSet
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // same untimed warmup as Bench
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      val r = spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      r.join(broadcast(r.limit(10)), "id").count()
      r.write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    println(f"${"query"}%-38s ${"constr"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s")
    var (tc, tp, te) = (0.0, 0.0, 0.0)
    sorted.foreach { case (name, fn) =>
      def onePass(): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val c = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis + optimization + physical
        val p = ms(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val e = ms(t2)
        spark.catalog.clearCache()
        (c, p, e)
      }
      try {
        onePass() // warm-up absorbs classload/codegen
        val (c, p, e) = onePass()
        tc += c; tp += p; te += e
        println(f"$name%-38s $c%7.0f $p%7.0f $e%7.0f ${c + p + e}%7.0f")
      } catch { case ex: Throwable =>
        println(f"$name%-38s FAILED ${ex.getMessage.take(80)}")
      }
    }
    println(f"${"TOTALS"}%-38s $tc%7.0f $tp%7.0f $te%7.0f ${tc + tp + te}%7.0f")
    spark.stop()
  }
}
