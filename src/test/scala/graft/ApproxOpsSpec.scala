package graft

import graft.operators.{BloomOps, HeavyHitters, RelationalOps}
import org.apache.spark.sql.functions._

/** Error-contract specs for the approximate/sketch-pruned operators —
  * bounds the oracle can't check (Space-Saving estimate error, Bloom
  * superset-then-exact equivalence, plan shape).
  */
class ApproxOpsSpec extends SparkSpec {

  test("spaceSaving kernel is exact below capacity") {
    val stream = Seq("a", "b", "a", "c", "a", "b").iterator
    val got = HeavyHitters.spaceSaving(stream, capacity = 16)
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === Map("a" -> ((3L, 0L)), "b" -> ((2L, 0L)), "c" -> ((1L, 0L))))
  }

  test("spaceSaving kernel: estimates overcount by at most err") {
    // capacity 4 on an 11-distinct stream forces evictions
    val items = Seq.fill(50)("hot") ++ Seq.tabulate(30)(i => s"cold${i % 10}")
    val got = HeavyHitters.spaceSaving(items.iterator, capacity = 4).toSeq
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"$item: Space-Saving never undercounts in-partition")
      assert(est - truth <= err, s"$item: overcount $est-$truth must be <= err $err")
    }
    // the hot item must be tracked, with an exact or near-exact count
    assert(got.exists(_._1 == "hot"))
  }

  test("heavyHitters: merged estimates within n/capacity of exact counts") {
    val cap = 64
    val edges = Tables.events(spark, sf)
      .withColumn("resource", get_json_object(col("props"), "$.k"))
      .repartition(8) // force real multi-partition merge at this SF
    val n = edges.filter(col("resource").isNotNull).count()
    val bound = n / cap + 1
    val approx = HeavyHitters.heavyHitters(spark, edges, col("resource"), cap)
    val exact = edges.filter(col("resource").isNotNull)
      .groupBy(col("resource").as("item")).agg(count(lit(1)).as("truth"))
    val joined = exact.join(approx, Seq("item"), "left").cache()
    // every item above the guarantee threshold survives the summaries
    val missedHeavy = joined.filter(col("truth") > bound && col("est").isNull)
    assert(missedHeavy.count() === 0,
      s"items with true count > n/k=$bound must be tracked")
    // merged estimates stay within the global +/- n/k band
    val offBand = joined.filter(col("est").isNotNull &&
      (col("est") > col("truth") + bound || col("est") < col("truth") - bound))
    assert(offBand.count() === 0)
    joined.unpersist()
  }

  test("qHeavyHitters agrees with exact top resources on uncontended data") {
    // at sf0.001 the per-partition capacity exceeds the resource
    // cardinality, so the sketch degenerates to exact counting — the
    // top-20 must match the exact ranking
    val approx = HeavyHitters.qHeavyHitters(spark, sf)
      .select(col("resource"), col("est"))
    val exact = Tables.events(spark, sf)
      .withColumn("resource", get_json_object(col("props"), "$.k"))
      .filter(col("resource").isNotNull)
      .groupBy("resource").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("resource").asc).limit(20)
    val diff = approx.join(exact, "resource")
      .filter(col("est") =!= col("n"))
    assert(diff.count() === 0)
    assert(approx.count() === exact.count())
  }

  test("bloomSemiJoin equals the exact semi join and probes in-plan") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val li = Tables.lineitem(spark, sf)
    val bloomed = BloomOps.bloomSemiJoin(li, col("l_orderkey"), urgent,
      col("o_orderkey"))
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    assert(bloomed.count() === exact.count())
    assert(bloomed.exceptAll(exact).count() === 0)
    // the probe is a native expression in the physical plan, not a UDF
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe must be in-plan")
  }

  test("bloomSemiJoin saturation fallback: undersized sketch degenerates to keep-all") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val li = Tables.lineitem(spark, sf)
    // 64 bits supports 8 keys; urgent has far more -> must fall back.
    // The guard lives INSIDE the scalar subquery now (r17 single-action
    // shape): a saturated sketch comes back NULL, might_contain(NULL, k)
    // is NULL, and coalesce(..., true) keeps every row — the plain
    // semi-join fallback without a second driver action.
    assert(urgent.count() > 8)
    val fallback = BloomOps.bloomSemiJoin(li, col("l_orderkey"), urgent,
      col("o_orderkey"), numBits = 64)
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    assert(fallback.count() === exact.count())
    // the guard itself: over-capacity count ⇒ the subquery's sketch is NULL
    val guarded = urgent.agg(
      when(count(col("o_orderkey")) <= lit(8L),
        BloomOps.bloomAgg(col("o_orderkey"), 8L, 64L))
        .otherwise(lit(null).cast(org.apache.spark.sql.types.BinaryType))).head
    assert(guarded.isNullAt(0), "a saturated sketch must be nulled by the guard")
  }

  test("bloom pre-filter passes all true matches (no false negatives)") {
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val nItems = math.max(urgent.count(), 1L)
    val bloom = urgent
      .select(BloomOps.bloomAgg(col("o_orderkey"), nItems, nItems * 8).as("bf"))
      .head.getAs[Array[Byte]](0)
    val li = Tables.lineitem(spark, sf)
    val prefiltered = li.filter(BloomOps.mightContain(bloom, col("l_orderkey")))
    val trueMatches = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    // superset property: prefilter keeps every true match
    assert(trueMatches.exceptAll(prefiltered).count() === 0)
    // and it actually prunes (false-positive rate is ~2%, urgent is ~1/5
    // of orders — anything close to full passthrough means a broken probe)
    assert(prefiltered.count() < li.count())
  }
}
