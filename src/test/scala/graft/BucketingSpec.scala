package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location (SURVEY §2 intro / §4.4): pre-bucketing both
  * sides of a recurring join on the join key removes the per-query shuffle
  * entirely — the physical plan joins bucket-to-bucket with no Exchange.
  * This is the storage-level answer for the 100 TB fact⋈fact joins that
  * can't broadcast: pay the partitioning once at write time, never again.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // (warehouse dir is set in the shared session fixture — static conf.)
    // AQE off for a stable plan shape in this assertion; bucketing works
    // identically with it on.
    withConf("spark.sql.adaptive.enabled", "false") {
      val li = Tables.t(spark, sfDir, "lineitem")
      val ord = Tables.t(spark, sfDir, "orders")
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      ord.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      // The join itself must not shuffle either side: the only exchange
      // allowed is the one for the final small aggregation.
      val joinPart = p.substring(p.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$p")

      // And it returns the same result as the unbucketed join.
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === expected)

      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
