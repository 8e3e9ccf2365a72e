package graft.operators

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations — SURVEY.md §2 A.3 (`union_outer_concat`) + B.4.
  *
  * `union_by_name_outer` reproduces the reference's outer concat semantics
  * (`bin/concatenate.py:128-139` anndata.concat(join="outer")): union of
  * column sets, absent entries filled with 0 — encoded once here via
  * `unionByName(allowMissingColumns=true)` + coalesce-to-zero (SURVEY §7.4
  * risk 2).
  */
object SetOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private def custNations(s: SparkSession, d: String) =
    t(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
  private def suppNations(s: SparkSession, d: String) =
    t(s, d, "supplier").select(col("s_nationkey").cast("int").as("nationkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_all" -> ((s, d) =>
      custNations(s, d).withColumn("src", lit("customer"))
        .unionByName(suppNations(s, d).withColumn("src", lit("supplier")))
        .groupBy("nationkey", "src").agg(count(lit(1)).as("n"))
        .orderBy("nationkey", "src")),

    "set_union_distinct" -> ((s, d) =>
      custNations(s, d).union(suppNations(s, d)).distinct().orderBy("nationkey")),

    "set_intersect" -> ((s, d) =>
      custNations(s, d).intersect(suppNations(s, d)).orderBy("nationkey")),

    "set_except" -> ((s, d) =>
      custNations(s, d).except(suppNations(s, d)).orderBy("nationkey")),

    // Multiset (bag) variants: duplicates participate by multiplicity —
    // intersectAll keeps min(countL, countR) copies, exceptAll keeps
    // countL - countR copies. Aggregated per key so the output is
    // deterministic without relying on duplicate row order.
    "set_intersect_all" -> ((s, d) =>
      custNations(s, d).intersectAll(suppNations(s, d))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")),

    "set_except_all" -> ((s, d) =>
      custNations(s, d).exceptAll(suppNations(s, d))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .orderBy("nationkey")),

    // Corpus snapshot diff — the data-ops primitive behind "what changed
    // between crawl N-1 and crawl N": FULL OUTER join of two snapshots
    // on the document key, rows classified added / removed / changed by
    // key presence + content digest. Snapshots are deterministic
    // derivations of `documents` (old drops doc_id%10==0, new drops
    // doc_id%7==0 and rewrites text for doc_id%5==0) so the oracle
    // rebuilds them exactly. At 100 TB this is ONE sort-merge join on
    // the snapshot key with digest-only payload (16-byte md5, not the
    // text) — the text column never shuffles; unchanged rows are
    // filtered out before the output sort.
    "snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val old = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("h_old"))
      val nw = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), md5(
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text"))).as("h_new"))
      old.join(nw, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h_old").isNull, lit("added"))
            .when(col("h_new").isNull, lit("removed"))
            .when(col("h_old") =!= col("h_new"), lit("changed")))
        .filter(col("status").isNotNull)
        .select("doc_id", "status")
        .orderBy("doc_id")
    }),

    // anndata outer-concat: two modality projections with disjoint value
    // columns, vertically unioned by name, missing entries = 0.
    "union_by_name_outer" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val x = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_quantity").as("qty"))
      val y = li.filter(col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_extendedprice").as("price"))
      x.unionByName(y, allowMissingColumns = true)
        .select(col("l_orderkey"),
          coalesce(col("qty"), lit(0.0)).as("qty"),
          coalesce(col("price"), lit(0.0)).as("price"))
        // keyed exchange BEFORE the aggregate (r17, the exactQuantiles
        // shape): the decimal-sum partial aggregate otherwise runs at
        // the one-row-group scan parallelism and barely compresses
        // (~2 rows per order); same single shuffle either way
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(U.dsum(col("qty")).as("sum_qty"),
          U.dsum(col("price")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT nationkey, src, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier)
        |GROUP BY nationkey, src ORDER BY nationkey, src""".stripMargin,
    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "set_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS h_old FROM documents
        |  WHERE doc_id % 10 <> 0),
        |nw AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
        |             ELSE text END) AS h_new
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT COALESCE(old.doc_id, nw.doc_id) AS doc_id,
        |  CASE WHEN old.h_old IS NULL THEN 'added'
        |       WHEN nw.h_new IS NULL THEN 'removed'
        |       WHEN old.h_old <> nw.h_new THEN 'changed' END AS status
        |FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id
        |WHERE (old.h_old IS NULL OR nw.h_new IS NULL OR old.h_old <> nw.h_new)
        |ORDER BY doc_id""".stripMargin,
    "union_by_name_outer" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM (
        |  SELECT l_orderkey, l_quantity AS qty, 0.0 AS price
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT l_orderkey, 0.0 AS qty, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'A')
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin
  )
}
