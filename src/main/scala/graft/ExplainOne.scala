package graft

/** Dev harness: print the executed plan of one SparkEntry query
  * (after execution, so AQE final plans are real).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    println(s"===== ${args(0)} =====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
