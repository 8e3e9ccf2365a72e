package graft.streaming

import graft.{Tables, U}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming surface — SURVEY.md §2 B.7.
  *
  * Each transform below is written against a plain DataFrame so the SAME
  * code path serves both batch (static `events` table — what the DuckDB
  * oracle checks) and streaming (`readStream`/MemoryStream — exercised in
  * StreamingSpec with watermarks and incremental triggers). That
  * batch/stream unification is the Structured Streaming model: the
  * streaming run incrementalizes the identical logical plan.
  *
  * State-boundedness at scale: every stateful op below keys its state by
  * (window|session, …) and the streaming tests attach watermarks so the
  * state store evicts; nothing accumulates unboundedly.
  */
object StreamingOps {

  /** Tumbling 1-hour windows per event_type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), U.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-window top-k heavy hitters: the tumbling count (incrementally
    * maintainable with watermarked state in streaming) followed by a
    * rank over each window's closed summary. In streaming this is the
    * standard two-stage shape — the windowed count runs incrementally;
    * the rank applies per FINALIZED window (downstream of the
    * watermark / in foreachBatch), because ranking an open window
    * would retract results. The batch form here is the exact analog;
    * the rank window partitions by window-start so its state is one
    * window's type summary, never the stream. */
  def windowTopK(events: DataFrame, k: Int = 3): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"))
      .withColumn("rnk", row_number().over(
        W.partitionBy("ws_us").orderBy(col("n").desc, col("event_type")))
        .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Sliding 10-minute windows every 5 minutes. */
  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws_us"), col("n"))

  /** Session windows per user with a 30-minute inactivity gap. */
  def sessionAgg(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("ss_us"), col("n"))

  /** Streaming-dedup analog: keep the first event per (user, type). In a
    * stream this is `dropDuplicatesWithinWatermark` (see StreamingSpec);
    * the batch equivalent is rank-1 in event-time order. */
  def firstPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(U.tsUs(col("ts")), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
  }

  /** Stream-stream interval join (batch analog): each click matched to
    * the views of the same user in the preceding 10 minutes. Equi-key on
    * user_id (the state key in the streaming run; see StreamingSpec's
    * watermarked version) + a time-range residual — exactly the shape
    * whose state Structured Streaming bounds with two watermarks. */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        U.tsUs(col("ts")).as("ctu"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), U.tsUs(col("ts")).as("vtu"))
    c.join(v, Seq("user_id"))
      .filter(col("vtu") <= col("ctu") &&
        col("ctu") - col("vtu") <= 10L * 60 * 1000000)
      .groupBy("click_id").agg(count(lit(1)).as("n_views"))
  }

  /** LEFT-OUTER stream-stream interval join (batch analog): like
    * [[clickViewJoin]] but every click row survives — a click with no
    * preceding view emits n_views = 0. In the streaming run this is
    * exactly what the watermarked left-outer join produces at state
    * EXPIRY: the unmatched left row is held in the state store until
    * the view-side watermark passes the end of its match interval,
    * then emitted with nulls (see StreamingSpec's execution test).
    * The time-range predicate must live in the JOIN condition, not a
    * post-filter — outer-join semantics differ, and it is also what
    * lets Structured Streaming derive the state retention bound. */
  def clickViewLeftJoin(events: DataFrame): DataFrame = {
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        U.tsUs(col("ts")).as("ctu"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), U.tsUs(col("ts")).as("vtu"))
    c.join(v,
      col("v_uid") === col("user_id") &&
        col("vtu") <= col("ctu") &&
        col("ctu") - col("vtu") <= 10L * 60 * 1000000, "left")
      .groupBy("click_id").agg(count(col("vtu")).as("n_views"))
  }

  /** Stream-static enrichment join: the unbounded stream joins a
    * broadcast dimension snapshot (re-resolved per micro-batch by
    * Structured Streaming, so dim updates between batches are picked
    * up). Stateless — no watermark needed for the join itself; the
    * downstream aggregate is the only stateful stage. At 100 TB/day the
    * dim stays a broadcast (or a state-store lookup if it outgrows
    * memory) and the stream never shuffles for the join. */
  def staticEnrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment"))), Seq("user_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), U.dsum(col("value")).as("sum_value"))

  /** Streaming approximate-distinct per key: a [[org.apache.spark.sql.streaming.StatefulProcessor]]
    * holding a mergeable DataSketches HLL (the library Spark's own
    * hll_sketch_agg uses) as binary state — distinct-count over an
    * unbounded stream in O(kB) state per key, where exact distinct would
    * need unbounded state. Emits the running estimate per key per batch.
    * The batch-side counterpart is `agg_hll_sketch_merge`; executed with
    * MemoryStream + assertions in StreamingSpec.
    *
    * State boundedness: each sketch is O(kB), but the store holds one
    * per key EVER seen — this is the one stateful op here whose state is
    * not watermark-evicted, because a lifetime distinct-count has no
    * event-time horizon. Production deployments must bound the key
    * domain or pass a [[org.apache.spark.sql.streaming.TTLConfig]]
    * (with `TimeMode.ProcessingTime`) so idle keys expire.
    */
  class ApproxDistinctPerKey(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long)] {
    import org.apache.datasketches.hll.HllSketch
    import org.apache.spark.sql.streaming.{OutputMode, TimerValues, TimeMode, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var sk: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[Array[Byte]]("hll", Encoders.BINARY, ttl)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val sketch = if (sk.exists()) HllSketch.heapify(sk.get())
        else new HllSketch(12)
      rows.foreach(r => sketch.update(r._2))
      sk.update(sketch.toCompactByteArray)
      Iterator((key, math.round(sketch.getEstimate)))
    }
  }

  /** Streaming SCD2 — the incremental sibling of `scd2_dimension`: a
    * per-user state machine holds (current state, valid_from) and each
    * state CHANGE emits the closed interval (Append output — closed
    * intervals are immutable facts, the streaming-friendly half of the
    * SCD2 contract; the still-open interval lives only in the state
    * store until its closing event arrives). Rows are (user_id, tsu,
    * event_id, state); within a batch the group sorts its rows by event
    * time (iterators arrive unordered), across batches arrival order is
    * trusted — the CDC convention; feed event-time-ordered batches (or
    * watermark + reorder upstream) for exact SCD2 semantics, as the
    * parity test does.
    *
    * State per key is O(1) (one string + one long) — unbounded key
    * domains want a TTL like [[ApproxDistinctPerKey]] documents. On a
    * STATIC Dataset the same code runs as one group pass, which is how
    * the oracled `stream_scd2_changes` query executes it.
    */
  def scd2Changes(events: org.apache.spark.sql.Dataset[(Long, Long, Long, String)])
      : org.apache.spark.sql.Dataset[(Long, String, Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            st: GroupState[(String, Long)]) => {
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long)]
          var cur = st.getOption
          sorted.foreach { case (_, tsu, _, state) =>
            cur match {
              case Some((cs, from)) if cs != state =>
                out += ((user, cs, from, tsu))
                cur = Some((state, tsu))
              case None => cur = Some((state, tsu))
              case _ => ()
            }
          }
          cur.foreach(st.update)
          out.iterator
        })
  }

  /** Streaming EWMA per key — the stateful-numeric sibling of the batch
    * `window_ewma` scan: a per-user `GroupState[(n, ewma)]` folds
    * 0.2·x + 0.8·acc over event-time-ordered rows (within a batch the
    * group sorts; across batches arrival order is trusted — the same
    * CDC convention as [[scd2Changes]]) and emits the running
    * (user, n_events, ewma) summary each batch. State per key is O(1):
    * two numbers, regardless of stream length — THE reason EWMA (not a
    * windowed mean) is the streaming smoother. On a static Dataset the
    * same code runs as one group pass, which is how the oracled
    * `stream_ewma` query executes it; the fold constants are spelled
    * 0.2/0.8 so batch, stream and the recursive-CTE oracle share the
    * identical IEEE sequence. */
  def ewmaPerKey(events: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, Double)],
            st: GroupState[(Long, Double)]) => {
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var cur = st.getOption
          sorted.foreach { case (_, _, _, v) =>
            cur = Some(cur match {
              case None => (1L, v)
              case Some((n, acc)) => (n + 1, 0.2 * v + 0.8 * acc)
            })
          }
          cur.foreach(st.update)
          cur.map(c => (user, c._1, c._2)).iterator
        })
  }

  /** [[ewmaPerKey]] ported to Spark 4's `transformWithState` API
    * (`StatefulProcessor` — the successor of flatMapGroupsWithState:
    * named state variables with their own encoders, TTL support,
    * timers, and a state store the runtime can evolve independently of
    * the function). IDENTICAL fold semantics — sort the batch's group
    * by (event time, event_id), fold 0.2·x + 0.8·acc from the stored
    * (n, ewma), emit the running summary — so the same
    * `stream_ewma` oracle pins both APIs; StreamingSpec runs this
    * processor over the same shuffled two-batch stream as the
    * flatMapGroupsWithState test and asserts the final summaries are
    * equal to the batch query exactly. transformWithState requires the
    * RocksDB state-store provider (the spec sets it per-query); the
    * registered query keeps the fMGWS engine, which runs on the
    * default provider. */
  class EwmaProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, Long, Long, Double),
        (Long, Long, Double)] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("ewma",
        Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var cur = if (st.exists()) Option(st.get()) else None
      sorted.foreach { case (_, _, _, v) =>
        cur = Some(cur match {
          case None => (1L, v)
          case Some((n, acc)) => (n + 1, 0.2 * v + 0.8 * acc)
        })
      }
      cur.foreach(st.update)
      cur.map(c => (key, c._1, c._2)).iterator
    }
  }

  /** Streaming Holt linear-trend smoothing per key — EWMA's two-state
    * sibling (level + trend), the forecast-capable smoother: for each
    * event-time-ordered x,
    *   level' = α·x + (1−α)·(level + trend)
    *   trend' = β·(level' − level) + (1−β)·trend
    * with α = 0.3, β = 0.1, init (level, trend) = (x₁, 0). State per key
    * is THREE numbers regardless of stream length — the same O(1)-state
    * argument that makes EWMA the streaming smoother, extended to carry
    * a slope so `level + trend` is a one-step forecast. Same
    * sort-within-batch / trust-arrival-across-batches convention and
    * the same batch/stream/recursive-CTE shared IEEE sequence as
    * [[ewmaPerKey]]. */
  def holtPerKey(events: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double, Double)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, Double)],
            st: GroupState[(Long, Double, Double)]) => {
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var cur = st.getOption
          sorted.foreach { case (_, _, _, x) =>
            cur = Some(cur match {
              case None => (1L, x, 0.0)
              case Some((n, l, b)) =>
                val l2 = 0.3 * x + 0.7 * (l + b)
                val b2 = 0.1 * (l2 - l) + 0.9 * b
                (n + 1, l2, b2)
            })
          }
          cur.foreach(st.update)
          cur.map(c => (user, c._1, c._2, c._3)).iterator
        })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_holt_linear" -> ((s, d) => {
      val sess = s; import sess.implicits._
      val ev = Tables.t(s, d, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), U.tsUs(col("ts")).as("tsu"),
          col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
      holtPerKey(ev)
        .toDF("user_id", "n_events", "level", "trend")
        .withColumn("level", U.round6(col("level")))
        .withColumn("trend", U.round6(col("trend")))
        .withColumn("forecast_1",
          U.round6(col("level") + col("trend")))
        .orderBy("user_id")
    }),

    "stream_ewma" -> ((s, d) => {
      val sess = s; import sess.implicits._
      val ev = Tables.t(s, d, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), U.tsUs(col("ts")).as("tsu"),
          col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
      ewmaPerKey(ev)
        .toDF("user_id", "n_events", "ewma")
        .withColumn("ewma", U.round6(col("ewma")))
        .orderBy("user_id")
    }),
    "stream_scd2_changes" -> ((s, d) => {
      val sess = s; import sess.implicits._
      val ev = Tables.t(s, d, "events")
        .select(col("user_id"), U.tsUs(col("ts")).as("tsu"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
      scd2Changes(ev)
        .toDF("user_id", "state", "valid_from", "valid_to")
        .orderBy("user_id", "valid_from", "state")
    }),
    "stream_join_interval" -> ((s, d) =>
      clickViewJoin(Tables.t(s, d, "events")).orderBy("click_id")),
    "stream_join_left_outer" -> ((s, d) =>
      clickViewLeftJoin(Tables.t(s, d, "events")).orderBy("click_id")),
    "stream_tumbling_agg" -> ((s, d) =>
      tumblingAgg(Tables.t(s, d, "events")).orderBy("ws_us", "event_type")),
    "stream_sliding_agg" -> ((s, d) =>
      slidingAgg(Tables.t(s, d, "events")).orderBy("ws_us")),
    "stream_window_topk" -> ((s, d) =>
      windowTopK(Tables.t(s, d, "events")).orderBy("ws_us", "rnk")),
    "stream_session_agg" -> ((s, d) =>
      sessionAgg(Tables.t(s, d, "events")).orderBy("user_id", "ss_us")),
    "stream_dedup_first" -> ((s, d) =>
      firstPerKey(Tables.t(s, d, "events"))
        .orderBy("user_id", "event_type")),
    "stream_static_enrich" -> ((s, d) =>
      staticEnrich(Tables.t(s, d, "events"), Tables.t(s, d, "customer"))
        .orderBy("c_mktsegment", "event_type")),

    // Batch analog of the watermark late-drop (the one B.7 key whose
    // execution check — StreamingSpec "watermark drops late rows" — had
    // no CORRECTNESS row): arrival order is event_id, event time gets a
    // deterministic back-jitter (the driver's events are arrival-ordered,
    // so disorder must be planted to make lateness non-vacuous), and the
    // watermark before each row is the strictly-before running max of
    // event time minus the 10-minute delay — the strictest
    // arrival-consistent form of Structured Streaming's batch-start
    // watermark. A row below it is LATE and excluded from its tumbling
    // window's count, exactly what the streaming agg's state eviction
    // does. The running max is the two-level block stitch (per-block
    // strict-before window + broadcast prefix max of block maxima) —
    // never a global raw-row window; Spark's greatest() skips nulls, so
    // hwm is null only for the global first row (kept by definition).
    "stream_watermark_late" -> ((s, d) => {
      val delayUs = 600L * 1000000
      val winUs = 600L * 1000000
      val ev = Tables.t(s, d, "events")
        .select(col("event_id"),
          (U.tsUs(col("ts")) - (col("event_id") % 10) * 180000000L)
            .as("etsu"))
        .withColumn("blk", expr("event_id div 4096"))
      val wLoc = Window.partitionBy("blk").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = ev.withColumn("lmax", max(col("etsu")).over(wLoc))
      val blocks = ev.groupBy("blk").agg(max(col("etsu")).as("bmax"))
        .withColumn("pmax", max(col("bmax")).over(
          Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("blk"), col("pmax"))
      local.join(broadcast(blocks), "blk")
        .withColumn("hwm", greatest(col("lmax"), col("pmax")))
        .withColumn("is_late",
          col("hwm").isNotNull && col("etsu") < col("hwm") - delayUs)
        .withColumn("ws_us", expr(s"(etsu div $winUs) * $winUs"))
        .groupBy("ws_us")
        .agg(count(when(!col("is_late"), 1)).as("n_kept"),
          count(when(col("is_late"), 1)).as("n_late"))
        .orderBy("ws_us")
    })
  )

  val oracles: Map[String, String] = Map(
    // the stream_ewma recursion with a second carried column; the l'
    // expression textually repeats inside the trend update — same
    // expression over the same inputs is the same IEEE double, so the
    // repetition cannot diverge from Spark's single evaluation
    "stream_holt_linear" ->
      """WITH RECURSIVE s AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT user_id, rn, value AS l, CAST(0.0 AS DOUBLE) AS b
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn,
        |    0.3 * s.value + 0.7 * (r.l + r.b),
        |    0.1 * ((0.3 * s.value + 0.7 * (r.l + r.b)) - r.l) + 0.9 * r.b
        |  FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1),
        |mx AS (SELECT user_id, max(rn) AS mrn FROM s GROUP BY user_id),
        |f AS (
        |  SELECT r.user_id, mx.mrn AS n_events,
        |    round(r.l * 1000000) / 1000000 AS level,
        |    round(r.b * 1000000) / 1000000 AS trend
        |  FROM r JOIN mx ON r.user_id = mx.user_id AND r.rn = mx.mrn)
        |SELECT user_id, n_events, level, trend,
        |  round((level + trend) * 1000000) / 1000000 AS forecast_1
        |FROM f ORDER BY user_id""".stripMargin,
    // the window_ewma recursive-CTE fold, read out at each key's last row
    "stream_ewma" ->
      """WITH RECURSIVE s AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, rn, value AS ewma FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.event_id, s.rn, 0.2 * s.value + 0.8 * r.ewma
        |  FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1),
        |mx AS (SELECT user_id, max(rn) AS mrn FROM s GROUP BY user_id)
        |SELECT r.user_id, mx.mrn AS n_events,
        |  round(r.ewma * 1000000) / 1000000 AS ewma
        |FROM r JOIN mx ON r.user_id = mx.user_id AND r.rn = mx.mrn
        |ORDER BY r.user_id""".stripMargin,
    // closed intervals only: exactly scd2_dimension minus the per-key
    // open tail (which in the stream still sits in the state store)
    "stream_scd2_changes" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS state, epoch_us(ts) AS tsu,
        |    event_id,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |chg AS (SELECT * FROM seq WHERE prev IS NULL OR prev <> state),
        |iv AS (
        |  SELECT user_id, state, tsu AS valid_from,
        |    lead(tsu) OVER (
        |      PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to
        |  FROM chg)
        |SELECT user_id, state, valid_from, valid_to
        |FROM iv WHERE valid_to IS NOT NULL
        |ORDER BY user_id, valid_from, state""".stripMargin,
    "stream_join_interval" ->
      """SELECT c.event_id AS click_id, count(*) AS n_views
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND epoch_us(v.ts) <= epoch_us(c.ts)
        | AND epoch_us(c.ts) - epoch_us(v.ts) <= 600000000
        |GROUP BY c.event_id ORDER BY click_id""".stripMargin,
    // count(v.ts) over the LEFT join: unmatched clicks emit 0 — the
    // row the streaming run emits at view-watermark expiry
    "stream_join_left_outer" ->
      """SELECT c.event_id AS click_id, count(v.ts) AS n_views
        |FROM events c LEFT JOIN events v
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view'
        | AND epoch_us(v.ts) <= epoch_us(c.ts)
        | AND epoch_us(c.ts) - epoch_us(v.ts) <= 600000000
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id ORDER BY click_id""".stripMargin,
    "stream_tumbling_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour',
        |         make_timestamp(epoch_us(ts)))) AS ws_us,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_window_topk" ->
      """WITH c AS (
        |  SELECT epoch_us(time_bucket(INTERVAL '1 hour',
        |           make_timestamp(epoch_us(ts)))) AS ws_us,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT ws_us, event_type, n,
        |    CAST(row_number() OVER (PARTITION BY ws_us
        |      ORDER BY n DESC, event_type) AS BIGINT) AS rnk
        |  FROM c)
        |SELECT ws_us, event_type, n, rnk
        |FROM r WHERE rnk <= 3 ORDER BY ws_us, rnk""".stripMargin,
    "stream_sliding_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '5 minutes',
        |         make_timestamp(epoch_us(ts)))
        |         - k.k * INTERVAL '5 minutes') AS ws_us,
        |  count(*) AS n
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_session_agg" ->
      """WITH e AS (SELECT user_id, make_timestamp(epoch_us(ts)) AS mts
        |           FROM events),
        |m AS (SELECT user_id, mts,
        |        CASE WHEN lag(mts) OVER (PARTITION BY user_id ORDER BY mts)
        |                  IS NULL
        |             OR mts - lag(mts) OVER (PARTITION BY user_id ORDER BY mts)
        |                  >= INTERVAL '30 minutes'
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |g AS (SELECT user_id, mts,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY mts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, epoch_us(min(mts)) AS ss_us, count(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, ss_us""".stripMargin,
    "stream_static_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_dedup_first" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    // the watermark analog replayed with a plain global running max —
    // equality with the Spark side is exactly the block-stitch proof
    "stream_watermark_late" ->
      """WITH s AS (
        |  SELECT event_id,
        |    epoch_us(ts) - (event_id % 10) * 180000000 AS etsu
        |  FROM events),
        |w AS (
        |  SELECT event_id, etsu,
        |    max(etsu) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM s)
        |SELECT (etsu // 600000000) * 600000000 AS ws_us,
        |  CAST(count(*) FILTER (
        |    WHERE hwm IS NULL OR etsu >= hwm - 600000000) AS BIGINT)
        |    AS n_kept,
        |  CAST(count(*) FILTER (
        |    WHERE hwm IS NOT NULL AND etsu < hwm - 600000000) AS BIGINT)
        |    AS n_late
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
