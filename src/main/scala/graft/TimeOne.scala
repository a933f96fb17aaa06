package graft


/** Dev harness: time one named query from [[SparkEntry.queries]] a few
  * times without paying the full Bench sweep. Usage:
  * `runMain graft.TimeOne <query> [sfDir] [runs]` — prints one
  * `TIMEQ <name> <times…>` line (seconds, per run, in order).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.localSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc conf overrides for A/B runs: SPARK_GRAFT_CONF="k=v;k=v"
    Tables.applyConfOverrides(spark)
    val fn = SparkEntry.queries(name)
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"TIMEQ $name " + times.map(t => f"$t%.3f").mkString(" "))
    spark.stop()
  }
}
