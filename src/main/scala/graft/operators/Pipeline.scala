package graft.operators

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship query — the reference's end-to-end data-product build
  * (`pipeline.cwl` → `bin/concatenate.py:119-152`) re-expressed as ONE
  * declarative Spark plan over the star-schema testdata (SURVEY.md §3.3,
  * §7.2):
  *
  *   per-modality fact tables (annotate: surrogate cell_id, dataset tag;
  *   `concatenate.py:66-77`) → vertical union (`:138-139` outer concat) →
  *   intersect_obs semi-restriction to cells present in every modality
  *   (`:99-102`) → donor-dimension broadcast join (`:105-111`) → product
  *   stats aggregation (`:81-96,142-143`).
  *
  * Scale shape: one shuffle for the intersect (key-level, projected to the
  * narrow cell_id column), one co-partitioned join on the fact key, one
  * partial+final aggregation; the customer dim is broadcast.
  */
object Pipeline {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  def flagship(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val cellId = concat_ws("-", col("l_orderkey"), col("l_linenumber"))

    // Per-modality spec: (name, membership predicate, feature key, value).
    // "cell_by_bin" (part-keyed) holds every line; "cell_by_gene"
    // (supplier-keyed) only finalized lines — so the obs intersection is
    // a strict subset, as in multi-modality MuData where not every cell
    // appears in every assay.
    val mods = Seq(
      ("cell_by_bin", lit(true),
        col("l_partkey"), col("l_quantity").cast("double")),
      ("cell_by_gene", col("l_linestatus") === "F",
        col("l_suppkey"), col("l_extendedprice").cast("double")))

    // ONE scan emits every modality's rows.
    val modalities = array(mods.map { case (n, keep, f, v) =>
      struct(lit(n).as("modality"), f.as("feature_id"), v.as("value"),
        keep.as("keep"))
    }: _*)
    val fact0 = li.select(
      cellId.as("cell_id"), col("l_orderkey"),
      col("l_returnflag").as("dataset"),
      explode(filter(modalities, m => m.getField("keep"))).as("m"))
      .select(col("cell_id"), col("l_orderkey"), col("dataset"),
        col("m.modality").as("modality"), col("m.feature_id").as("feature_id"),
        col("m.value").as("value"))

    // mu.pp.intersect_obs: cells present in ALL modalities. Partial-
    // aggregated key set + left-semi join: the aggregation shuffles only
    // one narrow row per cell (map-side partial agg collapses each cell's
    // lines before the exchange), and the join side is a bare key column —
    // AQE broadcasts it at small scale and falls back to a co-partitioned
    // sort-merge semi at 100 TB. The window formulation this replaces
    // (`collect_set(modality) over cell_id`) shuffled AND sorted the full
    // exploded fact and buffered a set per key — 2.2× slower at sf0.1 and
    // strictly worse at scale.
    //
    // Membership per modality is a static predicate list, so presence is
    // one boolean aggregate per modality — max(keep) — over the raw
    // lines: no Generate, no countDistinct expansion, and the scan
    // decodes only the key/predicate columns. The partial state is
    // (cell_id, int × nModalities), the narrowest possible.
    val qualified = li
      .groupBy(cellId.as("cell_id"))
      .agg(max(when(mods.head._2, 1).otherwise(0)).as("__m0"),
        mods.tail.zipWithIndex.map { case ((_, keep, _, _), i) =>
          max(when(keep, 1).otherwise(0)).as(s"__m${i + 1}")
        }: _*)
      .filter(mods.indices.map(i => col(s"__m$i") === 1).reduce(_ && _))
      .select("cell_id")
    val fact = fact0.join(qualified, Seq("cell_id"), "left_semi")

    // Donor metadata join (orders→customer, customer broadcast).
    val donor = t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("segment"))

    fact.join(donor, fact("l_orderkey") === donor("o_orderkey"))
      .groupBy("modality", "dataset", "segment")
      .agg(
        countDistinct(col("cell_id")).as("n_cells"),
        count(lit(1)).as("n_rows"),
        U.dsum(col("value")).as("sum_value"))
      .orderBy("modality", "dataset", "segment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flagship_product_build" -> ((s, d) => flagship(s, d))
  )

  val oracles: Map[String, String] = Map(
    "flagship_product_build" ->
      """WITH cbb AS (
        |  SELECT l_orderkey || '-' || l_linenumber AS cell_id, l_orderkey,
        |         l_partkey AS feature_id, l_quantity AS value,
        |         l_returnflag AS dataset, 'cell_by_bin' AS modality
        |  FROM lineitem),
        |cbg AS (
        |  SELECT l_orderkey || '-' || l_linenumber AS cell_id, l_orderkey,
        |         l_suppkey AS feature_id, l_extendedprice AS value,
        |         l_returnflag AS dataset, 'cell_by_gene' AS modality
        |  FROM lineitem WHERE l_linestatus = 'F'),
        |common AS (SELECT cell_id FROM cbb INTERSECT SELECT cell_id FROM cbg),
        |fact AS (
        |  SELECT * FROM cbb WHERE cell_id IN (SELECT cell_id FROM common)
        |  UNION ALL
        |  SELECT * FROM cbg WHERE cell_id IN (SELECT cell_id FROM common)),
        |donor AS (
        |  SELECT o_orderkey, c_mktsegment AS segment
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT modality, dataset, segment,
        |  count(DISTINCT cell_id) AS n_cells,
        |  count(*) AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM fact JOIN donor ON fact.l_orderkey = donor.o_orderkey
        |GROUP BY modality, dataset, segment
        |ORDER BY modality, dataset, segment""".stripMargin
  )
}
