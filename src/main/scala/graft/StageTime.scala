package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import scala.collection.mutable.ArrayBuffer

/** Dev tool: run one registered query and print per-stage wall time,
  * task count, and shuffle bytes — the feedback loop for deciding which
  * exchange/scan dominates a slow query.
  *
  * Usage: StageTime <queryName> [sfDir] [cpus]
  */
object StageTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).getOrElse("32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer[(Int, String, Long, Int, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            si.numTasks, si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.executorCpuTime / 1000000L))
        }
      }
    })
    // SPARK_GRAFT_STAGE_REPEAT=n: run the query n times and report the
    // LAST run's stages (steady-tier per-stage numbers — a single cold
    // run charges codegen compile + C1 execution to whichever stage ran
    // first, which is exactly the attribution error the bench's
    // back-to-back protocol exists to avoid).
    val repeat = sys.env.get("SPARK_GRAFT_STAGE_REPEAT")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
    val t0 = System.nanoTime()
    (1 until repeat).foreach { _ =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let listener events drain
      stages.synchronized(stages.clear())
    }
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s — $name @ $sfDir")
    // listener events are delivered async: poll until the stage list is
    // stable (fixed sleeps lose the final stages under machine load).
    var last = -1
    var stable = 0
    var waited = 0
    while (stable < 3 && waited < 10000) {
      val n = stages.synchronized(stages.size)
      if (n == last) stable += 1 else { stable = 0; last = n }
      Thread.sleep(200)
      waited += 200
    }
    println(f"${"stage"}%5s ${"wall_ms"}%8s ${"tasks"}%5s ${"shW_MB"}%8s ${"shR_MB"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s  name")
    stages.synchronized {
      stages.sortBy(_._1).foreach { case (id, n, w, t, sw, sr, rt, ct) =>
        println(f"$id%5d $w%8d $t%5d ${sw / 1e6}%8.1f ${sr / 1e6}%8.1f $rt%8d $ct%8d  $n")
      }
    }
    spark.stop()
  }
}
