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

  /** Conditional-aggregation pivot columns: per modality i, the row
    * count `__nr{i}` and exact decimal value sum `__sv{i}` of the rows
    * satisfying its membership predicate. */
  private def pivotAggs(
      mods: Seq[(String, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)]) =
    mods.zipWithIndex.flatMap { case ((_, keep, v), i) =>
      Seq(sum(when(keep, 1L).otherwise(0L)).as(s"__nr$i"),
        sum(when(keep, U.dec4(v))).as(s"__sv$i"))
    }

  def flagship(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    // The cell key is the (orderkey, linenumber) INT PAIR end-to-end —
    // the `cell_id` string of the product schema is a bijection of it
    // (orderkey || '-' || linenumber), so intersect/count-distinct over
    // the pair equals the same over the string, and every exchange
    // hashes/compares 12 bytes of ints instead of a concat'd string.
    val cellKey = Seq("l_orderkey", "l_linenumber")

    // Per-modality spec: (name, membership predicate, value). The
    // feature key of the product schema (part / supplier) never reaches
    // the stats aggregation, so it is NOT read here — the scan decodes 6
    // columns, not 8.
    // "cell_by_bin" (part-keyed) holds every line; "cell_by_gene"
    // (supplier-keyed) only finalized lines — so the obs intersection is
    // a strict subset, as in multi-modality MuData where not every cell
    // appears in every assay.
    val mods = Seq(
      ("cell_by_bin", lit(true), col("l_quantity").cast("double")),
      ("cell_by_gene", col("l_linestatus") === "F",
        col("l_extendedprice").cast("double")))

    // mu.pp.intersect_obs + per-modality stats in ONE pass over ONE
    // scan: modality membership is a static predicate list, so a
    // conditional-aggregation PIVOT per (cell, dataset) computes each
    // modality's row count and exact decimal value sum, and presence-in-
    // every-modality is a windowed sum over the cell — no second scan,
    // no semi join, no countDistinct Expand. A cell's lines can span
    // datasets (the key is NOT line-unique), so dataset stays a group
    // key and the intersection is tested across the whole cell.
    //
    // Exchange discipline: ONE explicit repartition by the ORDER key —
    // a subset of every downstream clustering, so it satisfies the
    // (cell, dataset) aggregation, the presence window over the cell,
    // the per-order reduction, AND the left side of the donor join:
    // the raw lines cross the wire exactly once and everything after
    // runs partition-local until the 30-row final aggregate. (Lines per
    // order are bounded, so order-grain partitioning is skew-safe at
    // scale.) The shuffle carries the 6 decoded columns of the raw
    // lines. The window formulation two rounds back
    // (`collect_set(modality) over cell_id`) also shuffled the fact
    // once but carried the full exploded fact and buffered a set per
    // key — this one buffers nothing and the windowed input is the
    // already-collapsed pivot.
    val perCellDs = li
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").as("dataset"))
      .agg(pivotAggs(mods).head, pivotAggs(mods).tail: _*)
    val cellW = org.apache.spark.sql.expressions.Window
      .partitionBy(cellKey.map(col): _*)
    val qualifiedCells = perCellDs
      .withColumn("__present",
        mods.indices.map(i => sum(col(s"__nr$i")).over(cellW) > lit(0L))
          .reduce(_ && _))
      .filter(col("__present"))

    // Unpivot the static modality columns back to rows (map-side — the
    // array is M structs of already-reduced scalars; a (cell, dataset)
    // slice with no rows of a modality contributes nothing, hence the
    // nr > 0 filter), then reduce to one row per (modality, dataset,
    // order). The cell key embeds the order key, so cells are
    // order-scoped and distinct-cell counts are ADDITIVE across orders:
    // n_cells needs no countDistinct — the oracle's
    // count(DISTINCT cell_id) agrees because cell_id embeds the order
    // key. Decimal partial sums re-sum exactly at each level (same
    // result as one-level U.dsum).
    val modRows = qualifiedCells.select(
      col("l_orderkey"), col("dataset"),
      explode(array(mods.zipWithIndex.map { case ((name, _, _), i) =>
        struct(lit(name).as("modality"), col(s"__nr$i").as("nr"),
          col(s"__sv$i").as("sv"))
      }: _*)).as("m"))
      .select(col("l_orderkey"), col("dataset"),
        col("m.modality").as("modality"), col("m.nr").as("nr"),
        col("m.sv").as("sv"))
      .filter(col("nr") > 0)
    val perOrder = modRows
      .groupBy("modality", "dataset", "l_orderkey")
      .agg(count(lit(1)).as("pc"), sum(col("nr")).as("pn"),
        sum(col("sv")).as("psv"))

    // Donor metadata join (orders→customer, customer broadcast).
    val donor = t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("segment"))

    perOrder.join(donor, perOrder("l_orderkey") === donor("o_orderkey"))
      .groupBy("modality", "dataset", "segment")
      .agg(
        sum(col("pc")).as("n_cells"),
        sum(col("pn")).as("n_rows"),
        U.dbl(sum(col("psv"))).as("sum_value"))
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
