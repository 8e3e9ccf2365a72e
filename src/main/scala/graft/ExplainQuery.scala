package graft

/** Dev helper main: print the formatted physical plan of one registered
  * query (`ExplainQuery <name> [sfDir]`). PlanDump regenerates the full
  * PLANS.md headline set; this is the single-query iteration loop —
  * rewrite an operator, eyeball its exchanges/reuse/codegen spans, and
  * only then re-bench.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
