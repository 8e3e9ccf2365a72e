// Shim in the Spark namespace: listenerBus/waitUntilEmpty are
// private[spark], and draining the async listener bus is the only way to
// attribute task metrics to the query whose timed window just closed
// (task-end events post asynchronously; without a drain the last tasks'
// executorRunTime would bleed into the NEXT query's delta).
package org.apache.spark {
  object GraftBusDrain {
    def drain(sc: SparkContext): Unit =
      try sc.listenerBus.waitUntilEmpty(10000L)
      catch { case _: Throwable => () }
  }
}

package graft {

  import java.lang.management.ManagementFactory
  import java.util.concurrent.atomic.AtomicLong
  import scala.jdk.CollectionConverters._

  import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
  import org.apache.spark.sql.SparkSession

  /** Bench self-attribution (VERDICT r12 item 1): the per-query wall time
    * alone could not explain four rounds of driver-tail divergence
    * (copurchase 7.03 s under the driver vs 3.13 s in the same-HEAD record
    * sweep), because nothing recorded WHERE the extra seconds went. This
    * collector snapshots, per timed window:
    *
    *  - `gc_ms`: JVM-wide GC time delta (all collector beans — in
    *    local[n] driver and executors share the JVM, so this is total GC
    *    landing inside the window);
    *  - `task_ms`: sum of executor task run time over tasks that ENDED in
    *    the window (listener-bus drained first, so the sum is the
    *    query's own tasks) — wall time far above task_ms/cores + gc means
    *    the stall was NOT Spark work (scheduler gap, external load);
    *  - a bench-start sentinel listing concurrent graft/sbt/spark JVMs
    *    (the stray-duplicate-sweep failure mode that contaminated the
    *    round-12 close: a "dead" background ritual still timing queries).
    */
  object BenchMetrics {
    private val taskMs = new AtomicLong(0L)
    private val taskCpuNs = new AtomicLong(0L)
    private val taskCount = new AtomicLong(0L)

    private final class L extends SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          // executorCpuTime is nanoseconds of ON-CPU time (VERDICT r15
          // item 2): task_ms (wall inside tasks) minus cpu_ms names the
          // time tasks spent scheduled-out — CPU steal from ambient
          // load, run-queue waits — which no JVM-internal counter
          // (gc_ms, jit_ms) can see. The copurchase driver-window
          // "task_ms doubled" signature becomes self-explaining when
          // cpu_ms stays flat while task_ms inflates.
          taskCpuNs.addAndGet(m.executorCpuTime)
          taskCount.incrementAndGet()
        }
      }
    }

    def install(spark: SparkSession): Unit =
      spark.sparkContext.addSparkListener(new L)

    /** (gcMs, taskMs, taskCpuMs, tasks) counters; diff two snapshots
      * for a window. */
    def snapshot(spark: SparkSession): (Long, Long, Long, Long) = {
      org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
      val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => math.max(0L, b.getCollectionTime)).sum
      (gc, taskMs.get(), taskCpuNs.get() / 1000000L, taskCount.get())
    }

    /** JIT state sample: (cumulative JIT compilation ms, code-cache
      * bytes in use across the CodeHeap pools). The round-14 follow-up
      * to the box sample: with GC, graft JVMs AND box ambient load all
      * excluded, the remaining suspect for "same plan, double task_ms
      * late in a 356-query suite" is the JVM compiler — hundreds of
      * queries of codegen classes fill the reserved code cache, and
      * under `-XX:+UseCodeCacheFlushing` (run_bench.sh) flushed hot
      * methods re-interpret until recompiled, inflating executor task
      * time with no GC signature. A query window with a large `jit_ms`
      * delta (recompilation churn) or a near-capacity
      * `codecache_used_mb` names that mechanism in the artifact. */
    def jitStat(): (Long, Long) = {
      val comp =
        try {
          val c = ManagementFactory.getCompilationMXBean
          if (c != null && c.isCompilationTimeMonitoringSupported)
            c.getTotalCompilationTime
          else -1L
        } catch { case _: Throwable => -1L }
      val cc =
        try ManagementFactory.getMemoryPoolMXBeans.asScala
          .filter(p => p.getName.contains("CodeHeap") ||
            p.getName.contains("Code Cache"))
          .map(_.getUsage.getUsed).sum
        catch { case _: Throwable => -1L }
      (comp, cc)
    }

    /** Box-level CPU/load sample (VERDICT r13 item 1): the r13
      * attribution excluded GC and concurrent graft JVMs from the
      * five-round copurchase driver-window divergence but could not SEE
      * what inflated task_ms 2.5× — the JVM sentinel only detects
      * graft/sbt processes, and whatever competed for cores in the
      * driver window was invisible to it. This sample reads, from
      * /proc (Linux-only; all fields -1 elsewhere, never a throw):
      *
      *  - `load1`: /proc/loadavg 1-minute run-queue average;
      *  - `busyJiffies`: non-idle CPU jiffies summed over all cores
      *    (/proc/stat "cpu" line, total minus idle+iowait);
      *  - `selfJiffies`: THIS process's utime+stime
      *    (/proc/self/stat — run_bench.sh launches the bench as a bare
      *    `java` process, so "self" is exactly the benchmarked JVM).
      *
      * Diffed across a query's timed window, busy − self is the CPU
      * time OTHER processes burned while the query ran — the ambient
      * load share that makes a core-saturated query's inflated wall
      * time self-explaining at last. Jiffies convert to ms at
      * USER_HZ = 100 (the Linux default everywhere this runs; the
      * value is a *ratio* consumer either way — ambient share =
      * nonself/(cores·wall) is HZ-invariant in the comparison that
      * matters, nonself vs self). */
    final case class BoxStat(load1: Double, busyJiffies: Long,
        selfJiffies: Long)

    private def readFirstLine(path: String): String = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().next() finally src.close()
    }

    def boxStat(): BoxStat = {
      val load1 =
        try readFirstLine("/proc/loadavg").split("\\s+")(0).toDouble
        catch { case _: Throwable => -1.0 }
      val busy =
        try {
          // "cpu  user nice system idle iowait irq softirq steal guest
          // guest_nice" — only the first 8 fields (through steal) are
          // summed: the kernel already folds guest/guest_nice into
          // user/nice, so including columns 9-10 would double-count
          // guest CPU on VM hosts (ADVICE r14).
          val f = readFirstLine("/proc/stat").split("\\s+").drop(1)
            .map(_.toLong).take(8)
          f.sum - f(3) - (if (f.length > 4) f(4) else 0L)
        } catch { case _: Throwable => -1L }
      val self =
        try {
          // comm (field 2) may contain spaces/parens: parse after the
          // LAST ')'; post-paren 0-indexed fields: state=0 … utime=11,
          // stime=12
          val line = readFirstLine("/proc/self/stat")
          val rest = line.substring(line.lastIndexOf(')') + 2)
            .split("\\s+")
          rest(11).toLong + rest(12).toLong
        } catch { case _: Throwable => -1L }
      BoxStat(load1, busy, self)
    }

    /** Other live graft/sbt/spark JVMs at bench start, excluding this
      * process and its ancestor chain (the sbt that launched us). Each
      * entry: "pid:cmd-snippet". A non-empty list means the box was NOT
      * exclusively ours and every number in the run is suspect. */
    def concurrentJvms(): Seq[String] = {
      try {
        val self = ProcessHandle.current()
        val ancestors = Iterator.iterate(Option(self)) {
          _.flatMap(p => p.parent().asScala())
        }.takeWhile(_.isDefined).flatten.map(_.pid()).toSet
        ProcessHandle.allProcesses().iterator().asScala
          .filterNot(p => ancestors.contains(p.pid()))
          .flatMap { p =>
            p.info().commandLine().asScala()
              .filter { c =>
                (c.contains("java") || c.contains("sbt")) &&
                  (c.contains("graft") || c.contains("sbt-launch") ||
                    c.contains("spark"))
              }
              .map { c =>
                val snip = c.replaceAll("\\s+", " ").trim
                s"${p.pid()}:${snip.substring(0, math.min(snip.length, 80))}"
              }
          }.toSeq
      } catch { case _: Throwable => Seq.empty }
    }

    /** java.util.Optional → Option without requiring scala 2.13.11+
      * OptionConverters import noise at every call site. */
    private implicit final class OptOps[T](private val o: java.util.Optional[T]) {
      def asScala(): Option[T] = if (o.isPresent) Some(o.get) else None
    }
  }
}
