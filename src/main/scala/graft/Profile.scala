package graft

/** Dev harness: stage-level timing of one named query. Usage:
  * `runMain graft.Profile [sfDir] [queryName]` (default
  * q_coaccess_pairs) — warms the query once, then re-executes a FRESH
  * plan with a stage listener attached, printing one
  * `STAGE <id> tasks=<n> ms=<dur>` line per completed stage and a final
  * `PROF fresh_<name> <sec>` total. Uses the same session config as
  * Verify/Bench ([[Tables.localSession]]);
  * `SPARK_GRAFT_CONF="k=v;k=v"` applies ad-hoc overrides for A/B runs.
  *
  * NOTE: always probe FRESH DataFrames — re-counting an already-executed
  * Dataset reuses its materialized AQE shuffle stages and only re-runs
  * the final stage, which wildly understates cost.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Tables.applyConfOverrides(spark)
    val name = args.lift(1).getOrElse("q_coaccess_pairs")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // JIT warm
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        val m = si.taskMetrics
        println(s"STAGE ${si.stageId} tasks=${si.numTasks} ms=${dur.getOrElse(-1L)} " +
          s"cpuMs=${m.executorCpuTime / 1000000} runMs=${m.executorRunTime} " +
          s"in=${m.inputMetrics.recordsRead} sr=${m.shuffleReadMetrics.recordsRead} " +
          s"sw=${m.shuffleWriteMetrics.recordsWritten} ${si.name.take(90)}")
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count() // fresh plan: full re-execution
    println(f"PROF fresh_$name ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
