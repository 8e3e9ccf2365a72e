package graft

import org.apache.spark.sql.SparkSession

/** The engine's session entry point: one place that encodes every
  * session-level semantic the library depends on, so applications,
  * the CLI mains (Verify/Bench/PlanDump/StageTime), and tests all run
  * with identical behavior.
  *
  * Semantics pinned here:
  *  - `GraftExtensions` (native functions poly_hash64 / minhash_sig /
  *    simhash64 + the RangeJoinRewrite optimizer rule);
  *  - ANSI off: cast-failure-to-null, matching the reference's
  *    pandas.to_numeric coercion (`bin/concatenate.py:110`) and DuckDB
  *    TRY_CAST (Spark 4 defaults ANSI on);
  *  - UTC session time zone (event-time arithmetic is zone-free);
  *  - nanosAsLong for TIMESTAMP(NANOS) parquet (see Tables.t);
  *  - NTZ inference off: untagged parquet timestamps are instants;
  *  - a low AQE coalesce floor so small-scale stages keep parallelism
  *    (inert at production sizes — see DESIGN_SCALE.md).
  *
  * On a cluster, call `configure(SparkSession.builder())` without
  * `master` and submit normally; the local knobs here are for the
  * single-JVM harness.
  */
object GraftSession {

  /** Apply the engine's required configs to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Generated-class cache sized for a MANY-DISTINCT-PLAN workload.
    // This is a STATIC, PER-JVM conf (must be set at session build; on
    // a cluster it ships via SparkConf so every executor JVM gets it
    // too — each executor has its own CodeGenerator cache with the same
    // 100-entry default). The default is smaller than one pass of this
    // engine's 360-query suite, so in any long-lived many-query session
    // every entry evicts before its plan re-runs and EVERY execution
    // recompiles its whole-stage classes from source — and the freshly
    // loaded classes then run their first profile-gathering executions
    // in low JIT tiers, which nearly doubled executor task time in the
    // r14 forensics (sf0.1 suite A/B at 4096: wall 298.5 → 215.6 s,
    // Σtask_ms 1978 → 1085 s, in-window jit_ms 213 → 114 s). Memory
    // cost is codecache, not heap: ~60 MB extra at 360-plan scale
    // (131 → 191 MB of the JVM's 1 GiB reserved code cache, i.e. ~19%
    // — capacity is nowhere near the constraint; eviction was). Sized
    // at 4096 so a production session cycling thousands of distinct
    // plans stays eviction-free; see DESIGN_SCALE.md §codegen.
    .config("spark.sql.codegen.cache.maxEntries",
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
    // Untagged parquet timestamp[us] (isAdjustedToUTC=false) must read as
    // TIMESTAMP, not TIMESTAMP_NTZ: event-time arithmetic (unix_micros)
    // operates on instants, and the DuckDB oracle reads the same naive
    // micros verbatim — with the UTC session zone the two agree bit-for-
    // bit. Spark 4 defaults this inference ON, which would instead surface
    // NTZ and reject unix_micros at analysis time.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")

  /** Local harness session: `local[cpus]`, shuffle partitions = cores.
    *
    * Scan/shuffle sizing stays at Spark defaults. Three mid-round-9
    * "small-SF tuning" overrides (maxPartitionBytes=1m,
    * advisoryPartitionSizeInBytes=2m, bloom threshold=0) were each
    * measured WORSE in single-knob A/B on the sf0.1 suite and
    * reverted: the testdata parquet is ONE row group per file, so a
    * small maxPartitionBytes only adds empty splits (a row group is
    * the atomic scan unit — nothing parallelizes); the 2 MB advisory
    * target over-fragments post-shuffle stages (join_sort_merge 1.37 s
    * → 0.97 s at 64 MB); and a zero bloom threshold taxes every
    * eligible join with a bloom-build aggregate (the capability query
    * scopes it to a cloned session instead — Pruning.bloomJoin).
    * SPARK_GRAFT_* env knobs remain for dev A/B. */
  def local(cpus: String, uiEnabled: Boolean = false): SparkSession = {
    def knob(env: String, dflt: String): String =
      sys.env.getOrElse(env, dflt)
    val spark = configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        knob("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        knob("SPARK_GRAFT_ADVISORY_BYTES", "64m"))
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        knob("SPARK_GRAFT_BLOOM_THRESHOLD", "10GB"))
      // Harness-only (cluster path `configure` is untouched): shuffle
      // cleanup runs SYNCHRONOUSLY on the ContextCleaner thread instead
      // of fire-and-forget. The round-11 bench forensics pinned async
      // deletion bursts (kicked off by the between-query System.gc())
      // landing inside the NEXT query's timed window as one of the
      // heavy-tail noise sources; serializing the deletes keeps the
      // burst inside the untimed cleanup gap where it was triggered.
      .config("spark.cleaner.referenceTracking.blocking.shuffle",
        knob("SPARK_GRAFT_BLOCKING_SHUFFLE_CLEANUP", "true"))
      // Status-store retention, capped: even with the UI off, the
      // app/SQL status listeners process every task event and retain
      // the last 1000 executions/jobs/stages WITH task metrics. In a
      // many-query session that store is pure overhead that grows with
      // position — measured on the 89-query bench prefix: the 90th
      // query ran 4.25 s under default retention vs 3.11 s capped, and
      // the prefix total dropped 87.8 → 71.2 s at the same heap (the
      // round-12 position-dependence forensics, BASELINE.md). Capped
      // low but nonzero so a dev attaching the UI to a live session
      // still sees the current query.
      .config("spark.sql.ui.retainedExecutions",
        knob("SPARK_GRAFT_RETAINED_EXECUTIONS", "8"))
      .config("spark.ui.retainedJobs",
        knob("SPARK_GRAFT_RETAINED_JOBS", "32"))
      .config("spark.ui.retainedStages",
        knob("SPARK_GRAFT_RETAINED_STAGES", "64"))
      .config("spark.ui.retainedTasks",
        knob("SPARK_GRAFT_RETAINED_TASKS", "1000"))
      // No UI attached → live entity updates are write-only work on
      // the listener thread; -1 defers store writes to completion
      // events (another -4 s on the 89-query prefix, copurchase
      // 3.15 → 3.0 s). Set a positive period if attaching a live UI.
      .config("spark.ui.liveUpdate.period",
        knob("SPARK_GRAFT_UI_LIVE_UPDATE", "-1"))
      // codegen.cache.maxEntries moved INTO `configure` (VERDICT r14
      // item 4): it is static and per-JVM, so the cluster path needs it
      // on every executor, not just this harness.
      .config("spark.ui.enabled", uiEnabled.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
