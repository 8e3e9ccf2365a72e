package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Planted-graph semantics for the round-9 graph family (clustering
  * coefficient, neighborhood Jaccard, k-core peel, assortativity).
  * Fixture: triangle {1,2,3} plus pendant 4 hanging off 1 — small
  * enough that every expectation below is hand-computed. Oracle parity
  * at data scale is the driver's DuckDB gate; these pin the math.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def trianglePendant =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")

  test("clustering coefficient: triangle members score 1, the hub is " +
    "diluted by its pendant, degree-1 nodes don't score") {
    val got = Graph.clusteringCoeff(trianglePendant)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // node 1: deg 3, 1 triangle → 2·1/(3·2) = 1/3
    assert(got(1L) === ((3L, 1L, 0.333333)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((2L, 1L, 1.0)))
    assert(!got.contains(4L)) // degree 1 — coefficient undefined
  }

  test("neighborhood jaccard: wedge-only candidates, " +
    "inclusion-exclusion denominators") {
    val got = Graph.jaccardNeighbors(trianglePendant)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    // N(1)={2,3,4} N(2)={1,3} N(3)={1,2} N(4)={1}
    assert(got((1L, 2L)) === ((1L, 0.25)))      // {3} / {1,2,3,4}\{}… 1/4
    assert(got((1L, 3L)) === ((1L, 0.25)))
    assert(got((2L, 3L)) === ((1L, 0.333333))) // {1} / (2+2−1)
    assert(got((2L, 4L)) === ((1L, 0.5)))
    assert(got((3L, 4L)) === ((1L, 0.5)))
    assert(!got.contains((1L, 4L))) // adjacent but no common neighbor
  }

  test("k-core peel: k=2 strips the pendant and early-stops on the " +
    "triangle; k=3 empties the graph — BOTH paths (driver-solve and " +
    "forced-distributed, cap 0) agree") {
    for (cap <- Seq(Long.MaxValue, 0L)) {
      val core2 = Graph.kcorePeel(trianglePendant, k = 2, rounds = 4,
          driverCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"cap=$cap")
      val core3 = Graph.kcorePeel(trianglePendant, k = 3, rounds = 4,
        driverCap = cap)
      assert(core3.count() === 0L, s"cap=$cap")
    }
  }

  test("degree assortativity: hand-computed Newman r on the " +
    "triangle+pendant (hub-leaf edge drives it negative)") {
    val r = Graph.degreeAssortativity(trianglePendant).collect()(0)
    // m=8 directed pairs; Σdu=Σdv=18, Σdudv=38, Σdu²=Σdv²=44
    // r = (38/8 − (18/8)²)/(44/8 − (18/8)²) = −0.3125/0.4375
    assert(r.getLong(0) === 8L)
    assert(r.getDouble(1) === -0.714286)
  }

  test("katz centrality: 3 hand-unrolled rounds on the " +
    "triangle+pendant, isolated node keeps the β mass — BOTH paths " +
    "(driver micro-unit solve and forced-distributed) agree") {
    val nodes = (1L to 5L).toDF("node")
    for (cap <- Seq(Long.MaxValue, 0L)) {
      val got = Graph.katzCentrality(trianglePendant, nodes,
          rounds = 3, alpha = 0.1, driverCap = cap)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // x1 = 1 everywhere; x2 = 1 + 0.1·deg; x3(v) = 1 + Σ round6(0.1·x2(n))
      assert(got === Map(1L -> 1.35, 2L -> 1.25, 3L -> 1.25,
        4L -> 1.13, 5L -> 1.0), s"cap=$cap")
    }
  }

  test("k-core peel holds the bounded-round contract: a long chain " +
    "loses exactly one layer per round") {
    // path 1-2-3-...-9: 2-core is empty, but peeling only removes the
    // two endpoints per round — after 2 rounds nodes 3..7 remain
    val chain = (1L to 8L).map(i => (i, i + 1)).toDF("a", "b")
    for (cap <- Seq(Long.MaxValue, 0L)) {
      val got = Graph.kcorePeel(chain, k = 2, rounds = 2, driverCap = cap)
        .select("vec_id").as[Long].collect().toSet
      assert(got === (3L to 7L).toSet, s"cap=$cap")
    }
  }

  test("HITS: the destination of a planted in-star is the top " +
    "authority, its feeders the top hubs") {
    val tmp = java.nio.file.Files.createTempDirectory("hits").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 30 users: each does one of a/b/c then lands on x; x never leads
    // anywhere, so x's hub score collapses while its authority peaks
    val rows = (0 until 30).flatMap { u =>
      val srcT = Seq("view_a", "view_b", "view_c")(u % 3)
      Seq(
        (new java.sql.Timestamp(t0.getTime + u * 1000L),
          (u * 2).toLong, u.toLong, srcT, 1.0, "{}"),
        (new java.sql.Timestamp(t0.getTime + u * 1000L + 500L),
          (u * 2 + 1).toLong, u.toLong, "checkout_x", 1.0, "{}"))
    }
    rows.toDF("ts", "event_id", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.operators.Graph
      .queries("graph_hits_types")(spark, tmp).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("hub"), r.getAs[Double]("authority"))).toMap
    assert(out("checkout_x")._2 > 0.99, out.toString) // all authority
    assert(out("checkout_x")._1 == 0.0, out.toString) // no out-edges
    Seq("view_a", "view_b", "view_c").foreach { s =>
      assert(out(s)._1 > 0.3, out.toString)      // equal hubs ~1/3
      assert(out(s)._2 == 0.0, out.toString)     // nothing points at them
    }
  }
}
