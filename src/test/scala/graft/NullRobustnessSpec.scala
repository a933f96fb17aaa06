package graft

import java.nio.file.Files

import graft.operators.{RelationalOps, ThreatOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Null-injection robustness: real logs carry null user_ids, payloads,
  * values, and timestamps (the reference's preprocess exists precisely to
  * drop them — data_preprocessing.py:29-31), and a round-3 advisor
  * finding showed a NULL user_id crashing a guard that the fixtures never
  * exercised. This suite rebuilds the sf0.001 events table with ~7% nulls
  * sprayed independently across user_id / props / value / ts and asserts
  * every events-only operator (a) executes, (b) is deterministic across
  * two runs, and (c) never emits a null user_id from a per-user rollup.
  */
class NullRobustnessSpec extends SparkSpec {

  private lazy val nullDir: String = {
    val dir = Files.createTempDirectory("graft-nulls").toFile.getAbsolutePath
    val s = spark
    // md5-derived deterministic "randomness": stable fixture, no seed state
    def maul(colName: String, salt: String): org.apache.spark.sql.Column =
      when(conv(substring(md5(concat(col("event_id").cast("string"), lit(salt))), 1, 4), 16, 10)
        .cast("long") % 14 === 0, lit(null)).otherwise(col(colName))
    Tables.events(s, sf)
      .withColumn("user_id", maul("user_id", "u"))
      .withColumn("props", maul("props", "p"))
      .withColumn("value", maul("value", "v"))
      .withColumn("ts", maul("ts", "t"))
      // write through the nanos-long round trip the loader expects
      .withColumn("ts", unix_micros(col("ts")) * 1000)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val eventQueries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_preprocess" -> (ThreatOps.qPreprocess _),
    "q_after_hours_top" -> (ThreatOps.qAfterHoursTop _),
    "q_activity_entropy" -> (ThreatOps.qActivityEntropy _),
    "q_coaccess_pairs" -> (ThreatOps.qCoaccessPairs _),
    "q_coaccess_capped" -> (ThreatOps.qCoaccessCapped _),
    "q_coaccess_components" -> (ThreatOps.qCoaccessComponents _),
    "q_peer_anomaly" -> (ThreatOps.qPeerAnomaly _),
    "q_blast_radius" -> (ThreatOps.qBlastRadius _),
    "q_degree_dist" -> (ThreatOps.qDegreeDist _),
    "q_risk_propagation" -> (ThreatOps.qRiskPropagation _),
    "q_handoff_pairs" -> (ThreatOps.qHandoffPairs _),
    "q_coaccess_jaccard" -> (ThreatOps.qCoaccessJaccard _),
    "q_burstiness" -> (ThreatOps.qBurstiness _),
    "q_autocorr" -> (ThreatOps.qAutocorr _),
    "q_funnel3" -> (RelationalOps.qFunnel3 _),
    "q_rfm" -> (RelationalOps.qRfm _),
    "q_weekly_retention" -> (RelationalOps.qWeeklyRetention _),
    "q_twap" -> (RelationalOps.qTwap _),
    "q_ohlc" -> (RelationalOps.qOhlc _),
    "q_attribution" -> (RelationalOps.qAttribution _),
    "q_cumulative_users" -> (RelationalOps.qCumulativeUsers _),
    "q_pareto_users" -> (RelationalOps.qParetoUsers _),
    "q_dau_wau" -> (RelationalOps.qDauWau _),
    "q_holt_forecast" -> (ThreatOps.qHoltForecast _),
    "q_holt_winters" -> (ThreatOps.qHoltWinters _),
    "q_scd2_history" -> (RelationalOps.qScd2History _))

  test("every events-only operator survives 7% nulls in user_id/props/value/ts, deterministically") {
    for ((name, fn) <- eventQueries) {
      val first =
        try fn(spark, nullDir).collect()
        catch { case e: Throwable =>
          fail(s"$name crashed on null-injected events: ${e.getMessage}")
        }
      val second = fn(spark, nullDir).collect()
      assert(first.toSeq === second.toSeq, s"$name nondeterministic under nulls")
    }
  }

  test("per-user rollups do not emit a null-user group") {
    for (name <- Seq("q_after_hours_top", "q_activity_entropy", "q_burstiness",
        "q_rfm", "q_coaccess_components", "q_peer_anomaly")) {
      val fn = eventQueries.toMap.apply(name)
      val out = fn(spark, nullDir)
      assert(out.columns.contains("user_id"))
      assert(out.filter(col("user_id").isNull).count() === 0,
        s"$name emitted a null user_id group")
    }
  }
}
