package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {

  test("q1Agg totals reconcile with a direct recount") {
    val agg = RelationalOps.q1Agg(spark, sf).agg(sum("count_order")).head.getLong(0)
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp")).count()
    assert(agg === direct)
  }

  test("q3Join returns at most 10 revenue-descending rows") {
    val rows = RelationalOps.q3Join(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("qWindow keeps first 3 orders per customer, rank consistent with running spend") {
    val df = RelationalOps.qWindow(spark, sf).cache()
    assert(df.filter(col("order_rank") > 3).count() === 0)
    // rank-1 rows: running_spend == o_totalprice (within rounding)
    val bad = df.filter(col("order_rank") === 1 &&
      abs(col("running_spend") - round(col("o_totalprice"), 2)) > 0.011)
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("qSessionize conserves events and bounds session stats") {
    val sess = RelationalOps.qSessionize(spark, sf).cache()
    val bad = sess.filter(col("n_sessions") < 1 ||
      col("max_session_events") < 1 ||
      col("max_session_duration_s") < 0 ||
      col("avg_session_events") > col("max_session_events") + 1e-9)
    assert(bad.count() === 0)
    // users in sessionize == users in events
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(sess.count() === users)
    sess.unpersist()
  }

  test("qWindowedCounts conserves total event count") {
    val total = RelationalOps.qWindowedCounts(spark, sf).agg(sum("n")).head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }
}
