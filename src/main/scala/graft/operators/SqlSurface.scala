package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front-end surface: the same engine driven through `spark.sql`
  * over registered views — proving the library is usable from the SQL
  * side (catalog views, ANSI-off cast semantics, and the native
  * extension functions injected by GraftExtensions are all visible to
  * SQL, not just to the DataFrame API).
  *
  * Each oracled query's SQL lives in ONE constant shared by the query
  * map and the oracle map — identical-by-construction, so the two
  * engines can never silently drift apart on edited text.
  */
object SqlSurface {

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    // Register the catalog views once per (session, dir) — re-reading 10
    // parquet schemas on every sql_* query would tax the bench numbers.
    // The skip requires BOTH the dir tag and a sentinel view to be
    // present: external Tables.registerViews calls for another dir leave
    // the tag stale, so any doubt re-registers (registration is cheap,
    // wrong views are not).
    val tag = "graft.views.dir"
    val cached = s.conf.getOption(tag).contains(d) &&
      s.catalog.tableExists("lineitem")
    if (!cached) {
      Tables.registerViews(s, d)
      s.conf.set(tag, d)
    }
    s.sql(sql)
  }

  // The TPC-H Q1 shape (decimal-bridged double sums, no avg — graft.U
  // rules apply to SQL text too).
  private val Q1 =
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |                AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price
      |FROM lineitem
      |WHERE l_quantity < 48
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // TPC-H Q3 shape: selective 3-way join + grouped revenue + top-k —
  // the planner must push all three filters below the joins, broadcast
  // the filtered customer dim, and plan the top-k as
  // TakeOrderedAndProject (asserted in PlanSpec).
  private val Q3 =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < DATE '1995-03-15'
      |  AND l_shipdate > DATE '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  // TPC-H Q5 shape: 6-way join across the whole star with the
  // same-nation constraint — the join-reordering stress test
  // (region/nation broadcast, fact joins co-keyed).
  private val Q5 =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // TPC-H Q7 shape: self-joined dim (nation × nation) with a disjunctive
  // pair predicate + derived year — tests that the planner keeps BOTH
  // nation copies broadcast and pushes the date band into the fact scan.
  // EXTRACT year is cast to BIGINT (Spark INT vs DuckDB BIGINT schemas).
  // The NATION_11/NATION_12 pair is non-empty at EVERY test SF including
  // sf0.001 (19+ rows) so the oracle check is never vacuous empty-vs-empty.
  private val Q7 =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |    AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12')
      |      OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11'))
      |    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // TPC-H Q10 shape: returned-item revenue ranking — date-banded fact,
  // two dim joins, grouped revenue, deterministic top-20 (custkey
  // tiebreaker; the classic text under-specifies ties).
  private val Q10 =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= DATE '1996-10-01'
      |  AND o_orderdate < DATE '1997-01-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // Correlated LATERAL subquery: greatest-n-per-group without a window
  // function — Spark decorrelates the per-customer ordered LIMIT; DuckDB
  // executes the same text natively.
  private val LateralTopN =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey <= 50
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_lateral_topn" -> ((s, d) => withViews(s, d)(LateralTopN)),
    "sql_q1_pricing" -> ((s, d) => withViews(s, d)(Q1)),
    "sql_q3_shipping" -> ((s, d) => withViews(s, d)(Q3)),
    "sql_q5_local_supplier" -> ((s, d) => withViews(s, d)(Q5)),
    "sql_q7_volume_shipping" -> ((s, d) => withViews(s, d)(Q7)),
    "sql_q10_returned_items" -> ((s, d) => withViews(s, d)(Q10)),

    // Native extension functions from SQL (poly_hash64 / simhash64 /
    // minhash_sig are injected by GraftExtensions — no registration call
    // needed in a GraftSession; the explicit registrations below only
    // cover bare test sessions). Rows-only: hash family is
    // engine-defined; parity is asserted in DedupSpec/TextOpsSpec.
    "sql_native_fns" -> ((s, d) => {
      graft.plans.PolyHash64.register(s)
      graft.plans.MinHashSig.register(s)
      graft.plans.SimHash64.register(s)
      withViews(s, d)(
      """SELECT doc_id,
        |  poly_hash64(text) AS fp,
        |  simhash64(split(lower(text), ' ')) AS sh,
        |  xxhash64(minhash_sig(array_distinct(split(lower(text), ' ')), 8))
        |    AS mh_digest
        |FROM documents ORDER BY doc_id""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_lateral_topn" -> LateralTopN,
    "sql_q1_pricing" -> Q1,
    "sql_q3_shipping" -> Q3,
    "sql_q5_local_supplier" -> Q5,
    "sql_q7_volume_shipping" -> Q7,
    "sql_q10_returned_items" -> Q10
  )
}
