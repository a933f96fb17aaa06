package graft

/** Standalone fixture builder: writes a [[ScaleProbe.amplify]] fixture
  * without timing anything — the gate runs (Verify + DuckDB compare on an
  * amplified dir) need the fixture but not the probe.
  *
  * Usage: runMain graft.Amplify <baseDir> <outDir> <factor> <mode> [copyOffset]
  */
object Amplify {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.amplify(spark, args(0), args(1), args(2).toInt, args(3),
      if (args.length > 4) args(4).toInt else 0)
    println(s"AMPLIFIED ${args(1)} x${args(2)} mode=${args(3)}")
    spark.stop()
  }
}
