package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Tables, U}

/** Graph analytics over the event stream — the contracted-graph pattern.
  *
  * PageRank (and label propagation, HITS, etc.) over a graph derived
  * from a 100 TB fact has two very different halves:
  *
  *   1. '''Contraction''' — build the weighted edge list. This is the
  *      distributed work: a per-user window (lag) orders each user's
  *      events and a partial+final aggregate collapses the transitions
  *      to one row per (src, dst). The shuffle carries (user, ts-µs,
  *      type) triples once; everything after runs on the contracted
  *      table.
  *   2. '''Iteration''' — power-iterate ranks on the contracted graph.
  *      Node count here is the event-type vocabulary (dozens), so the
  *      contracted graph is collected to the driver under a loud
  *      row-count guard — the same discipline as IVF centroid training
  *      ([[graft.similarity.Similarity]]) and the code-dim map
  *      ([[Joins]]): a genuinely tiny, cardinality-bounded table may
  *      drive a loop; a copy-paste onto an unbounded node set fails
  *      with a named error rather than OOMing the driver. (For graphs
  *      whose NODE set scales with the data — user×user — the loop
  *      would instead stay distributed: iterate rank-join-aggregate
  *      with persist/unpersist per step, the
  *      [[graft.dedup.Dedup]] pointer-doubling discipline.)
  *
  * Determinism: every per-edge contribution rounds to 1e-6 BEFORE the
  * exact micro-unit (decimal) sum, and each new rank rounds to 1e-6 —
  * so the ranks are partition-order invariant and engine-identical,
  * and the DuckDB oracle can unroll the same three iterations in SQL.
  * Dangling mass (nodes with no out-edges) is dropped, the standard
  * simplification; both sides implement the same convention.
  *
  * Reference ancestry: the reference pipeline has no graph operator —
  * this is part of the mandated beyond-reference engine surface
  * (SURVEY §2 Part B extensions).
  */
object Graph {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** Damping factor and iteration count pinned by the query contract. */
  private val damping = 0.85
  private val iterations = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the event-type transition graph: which states of
    // the user journey accumulate stationary mass. Contraction is the
    // distributed half (window + aggregate); the ≤|types|² contracted
    // edge list iterates on the driver under a guard.
    "graph_pagerank_types" -> ((s, d) => {
      val perUser = Window.partitionBy("user_id")
        .orderBy(U.tsUs(col("ts")), col("event_id"))
      val edgesDf = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("dst"))
        .withColumn("src", lag(col("dst"), 1).over(perUser))
        .filter(col("src").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .persist()
      // guard BEFORE collect — a distributed count so a data-scaled node
      // set fails loudly here instead of OOMing the driver materializing
      // the edge list it was about to reject
      val nEdges = edgesDf.count()
      require(nEdges <= 100000,
        s"contracted transition graph has $nEdges edges — beyond " +
          "the driver-iteration guard; for data-scaled node sets keep the " +
          "power iteration distributed (persist/unpersist per step)")
      val edges = edgesDf
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      edgesDf.unpersist()
      val nodes = t(s, d, "events")
        .select(col("event_type")).distinct()
        .collect().map(_.getString(0)).sorted
      val n = nodes.length
      val outW: Map[String, Long] =
        edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      // ranks in 1e-6 micro-units (Long): sums are exact integers, so
      // the driver loop is order-invariant like the decimal sums the
      // engine queries use. Arithmetic mirrors the oracle SQL token for
      // token (same IEEE double ops, then half-up round to micros).
      var rank: Map[String, Long] =
        nodes.map(_ -> math.round(1e6 / n)).toMap
      for (_ <- 1 to iterations) {
        val contribs = edges.map { case (src, dst, w) =>
          dst -> math.round(
            rank(src) / 1e6 * w / outW(src) * 1e6)
        }
        val in: Map[String, Long] =
          contribs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        rank = nodes.map { node =>
          val sum = in.getOrElse(node, 0L)
          node -> math.round(
            (0.15 / n + damping * (sum.toDouble / 1e6)) * 1e6)
        }.toMap
      }
      val sess = s; import sess.implicits._
      nodes.map(node => (node, rank(node) / 1e6)).toSeq
        .toDF("event_type", "pagerank")
        .orderBy("event_type")
    }))

  val oracles: Map[String, String] = Map(
    "graph_pagerank_types" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS dst,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS src
        |  FROM events),
        |edges AS (
        |  SELECT src, dst, count(*) AS w FROM seq
        |  WHERE src IS NOT NULL GROUP BY src, dst),
        |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
        |         FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT event_type AS node FROM events),
        |n AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, round(1000000.0 / n) / 1000000 AS r
        |       FROM nodes, n),
        |s1 AS (
        |  SELECT e.dst AS node, CAST(SUM(CAST(
        |      round(r.r * e.w / o.ow * 1000000) / 1000000
        |    AS DECIMAL(18,6))) AS DOUBLE) AS s
        |  FROM edges e JOIN outw o USING (src)
        |  JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r1 AS (
        |  SELECT node,
        |    round((0.15 / n + 0.85 * coalesce(s, 0.0)) * 1000000)
        |      / 1000000 AS r
        |  FROM nodes LEFT JOIN s1 USING (node), n),
        |s2 AS (
        |  SELECT e.dst AS node, CAST(SUM(CAST(
        |      round(r.r * e.w / o.ow * 1000000) / 1000000
        |    AS DECIMAL(18,6))) AS DOUBLE) AS s
        |  FROM edges e JOIN outw o USING (src)
        |  JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (
        |  SELECT node,
        |    round((0.15 / n + 0.85 * coalesce(s, 0.0)) * 1000000)
        |      / 1000000 AS r
        |  FROM nodes LEFT JOIN s2 USING (node), n),
        |s3 AS (
        |  SELECT e.dst AS node, CAST(SUM(CAST(
        |      round(r.r * e.w / o.ow * 1000000) / 1000000
        |    AS DECIMAL(18,6))) AS DOUBLE) AS s
        |  FROM edges e JOIN outw o USING (src)
        |  JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (
        |  SELECT node,
        |    round((0.15 / n + 0.85 * coalesce(s, 0.0)) * 1000000)
        |      / 1000000 AS r
        |  FROM nodes LEFT JOIN s3 USING (node), n)
        |SELECT node AS event_type, r AS pagerank
        |FROM r3 ORDER BY event_type""".stripMargin)
}
