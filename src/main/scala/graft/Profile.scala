package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time labeled sub-plans of a query to find the hot stage.
  * Usage: `runMain graft.Profile <sfDir>` — edit the probes below as
  * needed; prints `PROF <label> <sec>` lines (second-run steady state).
  * `SPARK_GRAFT_CONF="k=v;k=v"` applies ad-hoc conf overrides.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROF_PARTS", "32"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
    }
    val perResource = Tables.events(spark, sfDir)
      .withColumn("resource", get_json_object(col("props"), "$.k"))
      .filter(col("resource").isNotNull)
      .groupBy(col("resource"))
      .agg(collect_set(col("user_id")).as("users"))
      .filter(size(col("users")) >= 2)
      .select(col("users"))
    time("perResource") { perResource.count() }
    val rep = perResource.repartition(8)
    time("repartition8") { rep.count() }
    val partial = rep.as[Array[Long]].mapPartitions { groups =>
      val m = new graft.operators.LongCountMap(1 << 16)
      val flushed = groups.flatMap { users =>
        java.util.Arrays.sort(users)
        var i = 0
        val n = users.length
        var spill: Iterator[(Long, Long)] = Iterator.empty
        while (i < n - 1) {
          val a = users(i) << 32
          var j = i + 1
          while (j < n) { m.increment(a | users(j)); j += 1 }
          i += 1
        }
        spill
      }
      flushed ++ m.drain()
    }
    time("fold_emit") { partial.count() }
    val agg = partial.toDF("pk", "c")
      .repartition(32, col("pk"))
      .groupBy(col("pk")).agg(sum(col("c")).as("sr"))
      .filter(col("sr") >= 2)
    time("final_agg") { agg.count() }
    graft.operators.ThreatOps.qCoaccessPairs(spark, sfDir).count() // JIT warm
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        println(s"STAGE ${si.stageId} tasks=${si.numTasks} " +
          s"ms=${dur.getOrElse(-1L)}")
      }
    })
    val t0 = System.nanoTime()
    graft.operators.ThreatOps.qCoaccessPairs(spark, sfDir).count() // fresh
    println(f"PROF fresh_full ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
