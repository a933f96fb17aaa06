package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dumps the FINAL (post-AQE) `.explain("formatted")` plan of one or more
  * named queries to individual files — the before/after plan evidence an
  * optimization round commits alongside the code (plans/r16/<q>_before.txt).
  *
  * Usage: `runMain graft.PlanDump <outDir> <suffix> <query>[,query...] [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` per query. `all` dumps every
  * registered query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = Tables.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // execute so AQE final plans are real
      val txt = s"# $name — explain(formatted), post-AQE, over $sfDir\n\n" +
        df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
