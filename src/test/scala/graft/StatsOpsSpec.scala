package graft

import graft.operators.StatsOps
import org.apache.spark.sql.functions._

/** Invariants + local recomputation for the hypothesis-test queries —
  * each statistic is rebuilt in plain Scala from the raw fixture (with
  * the calendar keys derived by the same Spark expressions the operator
  * uses, so the check isolates the TEST MATH) and compared to the
  * distributed result.
  */
class StatsOpsSpec extends SparkSpec {

  private val isWeekend =
    when(expr("weekday(ts)") >= 5, 1).otherwise(0).as("wk")

  test("qKsTest: D matches a local ECDF recomputation, flag is consistent") {
    val rows = StatsOps.qKsTest(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val d = r.getAs[Double]("d_stat")
    val crit = r.getAs[Double]("crit_05")
    assert(d >= 0.0 && d <= 1.0 && crit > 0.0)

    // local recomputation: per (user, day, weekend-flag) counts
    val byWk = Tables.cleanEvents(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"), isWeekend)
      .collect()
      .groupBy(row => (row.getLong(0), row.getDate(1), row.getInt(2)))
      .toSeq
      .map { case ((_, _, wk), g) => (wk, g.length) }
    val wd = byWk.filter(_._1 == 0).map(_._2).sorted
    val we = byWk.filter(_._1 == 1).map(_._2).sorted
    assert(r.getAs[Long]("n_weekday") === wd.length.toLong)
    assert(r.getAs[Long]("n_weekend") === we.length.toLong)
    val support = (wd ++ we).distinct.sorted
    val dLocal = support.map { x =>
      math.abs(wd.count(_ <= x).toDouble / wd.length
        - we.count(_ <= x).toDouble / we.length)
    }.max
    assert(math.abs(d - math.rint(dLocal * 1e4) / 1e4) < 1e-9)
    assert(r.getAs[Long]("drift_flag") === (if (dLocal >
      1.358 * math.sqrt((wd.length + we.length).toDouble /
        (wd.length.toLong * we.length))) 1L else 0L))
  }

  test("qWelchTtest: t and df match a local recomputation") {
    val rows = StatsOps.qWelchTtest(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val vals = Tables.cleanEvents(spark, sf)
      .filter(col("value").isNotNull)
      .select(isWeekend, col("value"))
      .collect().map(row => (row.getInt(0), row.getDouble(1)))
    def stats(g: Seq[Double]): (Long, Double, Double) = {
      val n = g.length.toLong
      val m = g.sum / n
      val v = g.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (n0, m0, v0) = stats(vals.filter(_._1 == 0).map(_._2).toSeq)
    val (n1, m1, v1) = stats(vals.filter(_._1 == 1).map(_._2).toSeq)
    val (se0, se1) = (v0 / n0, v1 / n1)
    val t = (m1 - m0) / math.sqrt(se0 + se1)
    val df = (se0 + se1) * (se0 + se1) /
      (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1))
    assert(r.getAs[Long]("n_weekday") === n0)
    assert(r.getAs[Long]("n_weekend") === n1)
    // local float accumulation differs from the exact DECIMAL path by
    // rounding noise only
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3)
    assert(math.abs(r.getAs[Double]("df") - df) < 1.0)
    assert(r.getAs[Long]("significant") ===
      (if (math.abs(t) > 1.96) 1L else 0L))
  }

  test("qCorrMatrix: every pair bounded, matches Spark's built-in corr") {
    val rows = StatsOps.qCorrMatrix(spark, sf).collect()
    val k = StatsOps.CorrFeatures.length
    assert(rows.length === k * (k - 1) / 2)
    rows.foreach { r =>
      // NULL = a zero-variance feature (Pearson undefined); otherwise bounded
      if (!r.isNullAt(r.fieldIndex("corr"))) {
        val c = r.getAs[Double]("corr")
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9,
          s"corr out of range: ${r.mkString(",")}")
      }
    }
    // independent cross-check of one pair via Spark's streaming corr
    // (n_events vs n_after_hours — both vary at every fixture SF; n_types
    // can be constant on the tiny fixture, where Pearson is undefined)
    val u = Tables.cleanEvents(spark, sf).groupBy(col("user_id")).agg(
      count(lit(1)).cast("double").as("n_events"),
      sum(when(hour(col("ts")) < 8 || hour(col("ts")) > 18, 1L).otherwise(0L))
        .cast("double").as("n_after_hours"))
    val builtin = u.stat.corr("n_events", "n_after_hours")
    val got = rows.find(r => r.getString(0) == "n_events"
      && r.getString(1) == "n_after_hours").get.getAs[Double]("corr")
    assert(math.abs(got - builtin) < 2e-4,
      s"closed-form $got vs built-in $builtin")
  }

  test("qMutualInfo: MI from a local contingency table, bounds hold") {
    val r = StatsOps.qMutualInfo(spark, sf).collect().head
    val cells = Tables.cleanEvents(spark, sf)
      .select(col("event_type"),
        when(hour(col("ts")) < 8 || hour(col("ts")) > 18, 1).otherwise(0))
      .collect().map(x => (x.getString(0), x.getInt(1)))
    val n = cells.length.toDouble
    val byTc = cells.groupBy(identity).view.mapValues(_.length).toMap
    val byT = cells.groupBy(_._1).view.mapValues(_.length).toMap
    val byC = cells.groupBy(_._2).view.mapValues(_.length).toMap
    val mi = byTc.map { case ((t, c), k) =>
      (k / n) * math.log((k / n) / ((byT(t) / n) * (byC(c) / n)))
    }.sum
    def h(m: Map[_, Int]): Double =
      -m.values.map(k => (k / n) * math.log(k / n)).sum
    assert(r.getAs[Long]("n_events") === cells.length.toLong)
    assert(math.abs(r.getAs[Double]("mi_nats") - math.rint(mi * 1e4) / 1e4) < 1e-9)
    assert(math.abs(r.getAs[Double]("h_type") - math.rint(h(byT) * 1e4) / 1e4) < 1e-9)
    // MI ≤ min(H) and nmi in [0,1]
    assert(r.getAs[Double]("mi_nats") <= math.min(h(byT), h(byC)) + 1e-9)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
  }

  test("qCramersV: chi2 matches a local dense-grid recomputation, V in [0,1]") {
    val r = StatsOps.qCramersV(spark, sf).collect().head
    val cells = Tables.cleanEvents(spark, sf)
      .select(col("event_type"), expr("weekday(ts)"))
      .collect().map(x => (x.getString(0), x.getInt(1)))
    val n = cells.length.toDouble
    val byTc = cells.groupBy(identity).view.mapValues(_.length).toMap
    val byT = cells.groupBy(_._1).view.mapValues(_.length).toMap
    val byC = cells.groupBy(_._2).view.mapValues(_.length).toMap
    // dense grid INCLUDING zero cells — the operator recovers their mass
    // via the Σe = n identity
    val chi2 = (for (t <- byT.keys; c <- byC.keys) yield {
      val e = byT(t) * byC(c) / n
      val o = byTc.getOrElse((t, c), 0).toDouble
      (o - e) * (o - e) / e
    }).sum
    assert(r.getAs[Long]("n_events") === cells.length.toLong)
    assert(r.getAs[Long]("n_types") === byT.size.toLong)
    assert(r.getAs[Long]("n_dows") === byC.size.toLong)
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-3)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9)
    assert(math.abs(v - math.sqrt(chi2 / (n * (math.min(byT.size, byC.size) - 1)))) < 1e-4)
  }

  test("qMahalanobis: distance matches a local recomputation, flag consistent") {
    val rows = StatsOps.qMahalanobis(spark, sf).collect()
    val fs = StatsOps.CorrFeatures
    val feats = rows.map(r => (r.getAs[Long]("user_id"),
      fs.map(f => r.getAs[Long](f).toDouble).toArray))
    val n = feats.length.toDouble
    val means = fs.indices.map(i => feats.map(_._2(i)).sum / n)
    val vars = fs.indices.map { i =>
      val m = means(i)
      feats.map(x => (x._2(i) - m) * (x._2(i) - m)).sum / (n - 1)
    }
    rows.zip(feats).foreach { case (r, (_, x)) =>
      val d2 = fs.indices.map { i =>
        if (vars(i) > 0) (x(i) - means(i)) * (x(i) - means(i)) / vars(i) else 0.0
      }.sum
      // operator r4-rounds the reported distance: tolerance ≥ 5e-5
      assert(math.abs(r.getAs[Double]("m_dist2") - d2) < 1e-3,
        s"user ${r.getAs[Long]("user_id")}: ${r.getAs[Double]("m_dist2")} vs $d2")
      assert(r.getAs[Long]("is_outlier") ===
        (if (d2 > StatsOps.Chi2k5p99) 1L else 0L))
    }
    // the 99% gate keeps the flag rare but the query must surface SOME
    // structure: distances are nonnegative and nonconstant
    assert(rows.forall(_.getAs[Double]("m_dist2") >= 0.0))
    assert(rows.map(_.getAs[Double]("m_dist2")).distinct.length > 1)
  }
}
