package graft

import graft.operators.ThreatOps
import org.apache.spark.sql.functions._

/** Invariants the DuckDB oracle can't express: cross-query consistency
  * (degree = 2×count, features agree with standalone queries), bounds.
  */
class ThreatOpsSpec extends SparkSpec {

  test("qPreprocess derives consistent temporal flags") {
    val df = ThreatOps.qPreprocess(spark, sf).cache()
    assert(df.count() > 0)
    val bad = df.filter(
      (col("is_after_hours") === 1) =!= (col("hour_of_day") < 8 || col("hour_of_day") > 18) ||
      (col("is_weekend") === 1) =!= (col("day_of_week") >= 5) ||
      col("hour_of_day") < 0 || col("hour_of_day") > 23 ||
      col("day_of_week") < 0 || col("day_of_week") > 6)
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("qDegreeCentrality is exactly 2x qHighActivity for shared users") {
    val deg = ThreatOps.qDegreeCentrality(spark, sf)
    val act = ThreatOps.qHighActivity(spark, sf)
    val joined = deg.join(act, "user_id")
      .filter(col("total_degree") =!= col("activity_count") * 2)
    assert(joined.count() === 0)
  }

  test("entropy queries are non-negative and bounded by log2(n)") {
    val e = ThreatOps.qActivityEntropy(spark, sf)
    val bad = e.filter(col("activity_entropy") < 0 ||
      col("activity_entropy") > log2(col("activity_count")) + 1e-6)
    assert(bad.count() === 0)
  }

  test("qUserFeatures matches standalone behavioral queries") {
    val uf = ThreatOps.qUserFeatures(spark, sf).cache()
    assert(uf.count() > 0)
    // ratios in [0,1]; entropy consistent with qActivityEntropy
    assert(uf.filter(col("after_hours_ratio") < 0 || col("after_hours_ratio") > 1 ||
      col("weekend_ratio") < 0 || col("weekend_ratio") > 1).count() === 0)
    val standalone = ThreatOps.qActivityEntropy(spark, sf)
      .select(col("user_id"), col("activity_entropy").as("ae2"))
    val mismatch = uf.join(standalone, "user_id")
      .filter(abs(col("activity_entropy") - col("ae2")) > 1e-9)
    assert(mismatch.count() === 0)
    uf.unpersist()
  }

  test("qHourlyHeatmap row sums equal per-user activity counts") {
    val hm = ThreatOps.qHourlyHeatmap(spark, sf)
      .withColumn("rowsum", (0 until 24).map(h => col(f"h_$h%02d")).reduce(_ + _))
    val act = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(hm.join(act, "user_id").filter(col("rowsum") =!= col("n")).count() === 0)
  }

  test("approx distinct resources stays within HLL error of exact") {
    val approx = ThreatOps.qResourceAccessApprox(spark, sf)
      .select(col("user_id"), col("approx_resources"))
    val exact = ThreatOps.qResourceAccess(spark, sf)
      .select(col("user_id"), col("unique_resources"))
    val joined = approx.join(exact, "user_id")
      .filter(abs(col("approx_resources") - col("unique_resources"))
        > col("unique_resources") * 0.15 + 2)
    assert(joined.count() === 0)
  }

  test("qAnomalyReport joins every detector for every user") {
    val r = graft.operators.MLOps.qAnomalyReport(spark, sf).cache()
    assert(r.count() === graft.operators.ThreatOps.qUserFeatures(spark, sf).count())
    assert(r.filter(col("votes") =!= col("flag_z") + col("flag_q") + col("flag_k")
      + col("flag_d") + col("flag_r") + col("flag_i") + col("flag_m")).count() === 0)
    r.unpersist()
  }

  test("qStratifiedSample draws roughly the target fraction per language") {
    val sample = graft.operators.TextOps.qStratifiedSample(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("sampled"))
    val full = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("total"))
    val off = sample.join(full, "lang")
      .filter(col("sampled") < col("total") * 0.05 ||
        col("sampled") > col("total") * 0.45)
    assert(off.count() === 0, "each stratum should be near 20% sampled")
  }

  test("top-k queries respect limit and deterministic ordering") {
    val rows = ThreatOps.qAfterHoursTop(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "must be count-descending")
  }

  test("qCoaccessPairs: primitive-map fold matches a plain self-join recount") {
    val fold = ThreatOps.qCoaccessPairs(spark, sf)
    val ur = Tables.events(spark, sf)
      .withColumn("resource", get_json_object(col("props"), "$.k"))
      .filter(col("resource").isNotNull)
      .select(col("user_id"), col("resource")).distinct()
    val joined = ur.as("a").join(ur.as("b"),
        col("a.resource") === col("b.resource") &&
          col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"))
      .agg(count(lit(1)).as("sr"))
      .filter(col("sr") >= 2)
      .orderBy(col("sr").desc, col("user_a"), col("user_b"))
      .limit(100)
    val diff = fold.join(joined, Seq("user_a", "user_b"), "full")
      .filter(col("shared_resources").isNull || col("sr").isNull ||
        col("shared_resources") =!= col("sr"))
    assert(diff.count() === 0)
  }

  test("foldPairs: tiny flushAt (mid-group drains) still sums to exact pair counts") {
    // 3 overlapping groups; brute-force expected counts
    val groups = Seq(Array(1L, 2L, 3L, 4L), Array(2L, 3L, 5L), Array(1L, 2L, 3L))
    val expected = groups.flatMap { g =>
      for (i <- g.indices; j <- g.indices if g(i) < g(j)) yield (g(i), g(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // flushAt=2 forces a drain nearly every anchor row — the hot-key path
    val partials = ThreatOps.foldPairs(groups.iterator.map(_.clone()), 2).toSeq
    val summed = partials.groupBy(_._1).view
      .mapValues(_.map(_._2).sum)
      .map { case (pk, c) => ((pk >> 32, pk & 0xffffffffL), c) }.toMap
    assert(summed === expected)
    // and a large flushAt (no mid-group drain) agrees
    val one = ThreatOps.foldPairs(groups.iterator.map(_.clone()), 1 << 20).toSeq
    assert(one.map(_._2).sum === expected.values.sum)
    assert(one.size === expected.size, "fully combined when map never flushes")
  }

  test("coaccessPairsWide (struct-key fallback) matches the packed-long path") {
    val packed = ThreatOps.qCoaccessPairs(spark, sf)
    val wide = ThreatOps.coaccessPairsWide(spark, sf)
      .withColumnRenamed("shared_resources", "sr_wide")
    val diff = packed.join(wide, Seq("user_a", "user_b"), "full")
      .filter(col("shared_resources").isNull || col("sr_wide").isNull ||
        col("shared_resources") =!= col("sr_wide"))
    assert(diff.count() === 0)
  }

  test("qSketchRollup: sketch estimates track exact distincts; union row present") {
    val r = ThreatOps.qSketchRollup(spark, sf).cache()
    val exact = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("exact"))
    // HLL lgK=12 keeps relative error ~1.6%; allow 5% slack + small-count floor
    val offBand = r.filter(col("day") =!= "ALL").join(exact, "day")
      .filter(abs(col("est_users") - col("exact")) >
        greatest(col("exact") * 0.05, lit(2.0)))
    assert(offBand.count() === 0)
    val all = r.filter(col("day") === "ALL").collect()
    assert(all.length === 1)
    val exactAll = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(math.abs(all(0).getLong(1) - exactAll) <= math.max(exactAll * 0.05, 2.0))
    // event mass conserves: ALL row equals the sum of the daily rows
    val dailySum = r.filter(col("day") =!= "ALL")
      .agg(sum("n_events")).head.getLong(0)
    assert(all(0).getLong(2) === dailySum)
    r.unpersist()
  }

  test("qSketchSetops: theta set algebra tracks the exact populations") {
    val rows = ThreatOps.qSketchSetops(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows(0)
    def num(f: String): Double = r.getAs[Any](f) match {
      case d: Double => d
      case l: Long => l.toDouble
      case o => fail(s"unexpected estimate type for $f: $o")
    }
    def users(t: String) = Tables.events(spark, sf)
      .filter(col("event_type") === t).select("user_id").distinct()
    val c = users("click").count()
    val p = users("purchase").count()
    val both = users("click").intersect(users("purchase")).count()
    val union = users("click").union(users("purchase")).distinct().count()
    def ok(est: Double, exact: Long) =
      math.abs(est - exact) <= math.max(exact * 0.05, 2.0)
    assert(ok(num("est_click"), c))
    assert(ok(num("est_purchase"), p))
    assert(ok(num("est_union"), union))
    assert(ok(num("est_both"), both))
    assert(ok(num("est_click_only"), c - both))
  }

  test("qEventTransitions: bigram mass = N - #users, per-source probs sum to 1") {
    val tr = ThreatOps.qEventTransitions(spark, sf).cache()
    val n = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(tr.agg(sum("n")).head.getLong(0) === n - users)
    val probSums = tr.groupBy("from_type").agg(sum("prob").as("p")).collect()
    assert(probSums.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-2),
      "per-source transition probabilities must sum to ~1 (4 dp rounding)")
    tr.unpersist()
  }

  test("qRareAccessPmi: joint counts bounded by marginals, ascending order") {
    val pmi = ThreatOps.qRareAccessPmi(spark, sf).cache()
    assert(pmi.count() > 0)
    assert(pmi.filter(col("n_ur") > col("n_u") || col("n_ur") > col("n_r"))
      .count() === 0, "joint count can never exceed a marginal")
    val scores = pmi.select("pmi").collect().map(_.getDouble(0))
    assert(scores.sameElements(scores.sorted), "bottom-100 must ascend")
    pmi.unpersist()
  }

  test("qEwmaDrift: drift = n/ewma7, baseline null only on a user's first day") {
    val d = ThreatOps.qEwmaDrift(spark, sf).cache()
    // drift recomputes from its own columns (4 dp rounding slack: both
    // columns round independently)
    val bad = d.filter(col("ewma7").isNotNull &&
      abs(col("drift") - round(col("n") / col("ewma7"), 4)) > 1e-3)
    assert(bad.count() === 0)
    // a NULL baseline means no activity in the prior 7 days — and the
    // FIRST day per user always has none
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val firstDays = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(firstDays.filter(col("ewma7").isNotNull).count() === 0)
    d.unpersist()
  }

  test("coaccessPairs tolerates NULL user_id rows (both paths drop them)") {
    // Real logs carry NULL user_ids (qPreprocess's null-drop exists for
    // them). The packable-range guard must never see a NULL — when(NULL)
    // would fall through to the raise_error branch and fail the query.
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullids").toString
    val s = spark
    import s.implicits._
    val rows = Seq[(Long, Long, java.lang.Long, String, Double, String)](
      (1L, 1000000000L, 1L, "login", 1.0, """{"k":"r1"}"""),
      (2L, 2000000000L, 2L, "login", 1.0, """{"k":"r1"}"""),
      (3L, 3000000000L, null, "login", 1.0, """{"k":"r1"}"""),
      (4L, 4000000000L, 1L, "login", 1.0, """{"k":"r2"}"""),
      (5L, 5000000000L, 2L, "login", 1.0, """{"k":"r2"}"""),
      (6L, 6000000000L, null, "login", 1.0, """{"k":"r2"}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    for (df <- Seq(ThreatOps.qCoaccessPairs(spark, tmp),
        ThreatOps.coaccessPairsWide(spark, tmp))) {
      val got = df.collect()
      assert(got.length === 1)
      assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 2L &&
        got(0).getLong(2) === 2L)
    }
  }

  test("coaccessPairs degree cap only removes hot-resource contributions") {
    val full = ThreatOps.coaccessPairs(spark, sf, Int.MaxValue)
      .withColumnRenamed("shared_resources", "sr_full")
    val capped = ThreatOps.coaccessPairs(spark, sf, 10)
    // capped counts are a lower bound of uncapped for surviving pairs
    val inflated = capped.join(full, Seq("user_a", "user_b"))
      .filter(col("shared_resources") > col("sr_full"))
    assert(inflated.count() === 0)
  }

  test("kCorePeel keeps a planted 4-clique and peels a star; qKcore fixpoint lands inside the round bound") {
    val s = spark
    import s.implicits._
    // 4-clique (nodes 1-4, degree 3 each) + star (center 10, leaves
    // 11-15: leaves have degree 1, so the whole star peels away at k=3
    // even though the CENTER's degree is 5 — embeddedness, not volume).
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val star = (11L to 15L).flatMap(l => Seq((10L, l), (l, 10L)))
    val edges = (clique ++ star).toSeq.toDF("src", "dst")
    val core = operators.GraphOps.kCorePeel(edges, k = 3, rounds = 8)
    val kept = core.select("src").distinct().as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L), s"expected the clique, got $kept")
    assert(core.count() === 12, "4-clique has 12 directed edges")
    // ASYMMETRIC frame (the r10 advisory's hazard): node 99 appears only
    // as dst, so every src-side degree is >= k at round 0 — a src-only
    // convergence probe would early-exit and keep the (1,99) edge, but
    // the dst semi-join semantics peel it. The default (un-vouched) path
    // must detect the dst-only node, run the peel round, and converge to
    // the bare clique; the assumeSymmetric fast path is caller-vouched.
    val asym = (clique ++ Seq((1L, 99L))).toSeq.toDF("src", "dst")
    val asymCore = operators.GraphOps.kCorePeel(asym, k = 3, rounds = 8)
    assert(asymCore.count() === 12,
      "dst-only edge must peel on an asymmetric frame")
    assert(asymCore.filter(col("dst") === 99L).count() === 0)
    // real fixture: every emitted within-core degree >= k is EXACTLY the
    // fixpoint certificate — had the 8-round bound run out before
    // convergence, some survivor would still carry degree < k in the
    // final subgraph.
    val at8 = ThreatOps.qKcore(spark, sf).collect().toSeq
    assert(at8.forall(r => r.getLong(1) >= ThreatOps.KcoreK),
      "a survivor with within-core degree < k means the peel did not converge inside the round bound")
  }

  test("qClusteringCoeff: triangle counts agree with qKnnTriangles; lcc is the exact integer ratio") {
    val cc = ThreatOps.qClusteringCoeff(spark, sf).collect()
    assert(cc.nonEmpty)
    val tri = ThreatOps.qKnnTriangles(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_triangles")).toMap
    for (r <- cc) {
      val (u, d, t, bp) = (r.getAs[Long]("user_id"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("lcc_bp"))
      assert(d >= 1, s"user $u in the edge frame must have degree >= 1")
      // same triangle join, same Memo'd edge frame — counts must agree
      assert(t === tri.getOrElse(u, 0L), s"user $u: triangle count diverges from qKnnTriangles")
      // exact integer replay of the emitted ratio
      val expected = if (d >= 2) t * 2 * 10000 / (d * (d - 1)) else 0L
      assert(bp === expected, s"user $u: lcc_bp $bp != $expected")
      assert(bp >= 0 && bp <= 10000, s"user $u: lcc_bp $bp out of [0, 10000]")
    }
    // every triangle participant appears in the coefficient frame
    assert(tri.keySet.subsetOf(cc.map(_.getAs[Long]("user_id")).toSet))
  }

  test("qHandoffBalance: flow conserves (every handoff has one sender, one receiver)") {
    val bal = ThreatOps.qHandoffBalance(spark, sf).collect()
    assert(bal.nonEmpty)
    assert(bal.map(_.getAs[Long]("n_out")).sum === bal.map(_.getAs[Long]("n_in")).sum,
      "total initiated must equal total received")
    assert(bal.map(_.getAs[Long]("net")).sum === 0L)
    for (r <- bal) {
      assert(r.getAs[Long]("net") === r.getAs[Long]("n_out") - r.getAs[Long]("n_in"))
      assert(r.getAs[Long]("n_recipients") <= r.getAs[Long]("n_out"))
      assert(r.getAs[Long]("n_senders") <= r.getAs[Long]("n_in"))
    }
    // the top directed pair's sender must carry at least that many n_out
    val top = ThreatOps.qHandoffPairs(spark, sf).collect()
    if (top.nonEmpty) {
      val byUser = bal.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_out")).toMap
      assert(byUser(top.head.getAs[Long]("user_from")) >= top.head.getAs[Long]("n_handoffs"))
    }
  }

  test("qComponentDensity: sizes match the component rollup, edges fit inside C(n,2), density replays") {
    val cd = ThreatOps.qComponentDensity(spark, sf).collect()
    assert(cd.nonEmpty)
    val compSizes = ThreatOps.qCoaccessComponents(spark, sf).collect()
      .groupBy(_.getAs[Long]("component_id"))
      .map { case (c, rs) => c -> rs.head.getAs[Long]("component_size") }
    for (r <- cd) {
      val (c, n, e, bp) = (r.getAs[Long]("component_id"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("density_bp"))
      assert(n === compSizes(c), s"component $c: n_users diverges from qCoaccessComponents")
      assert(e <= n * (n - 1) / 2, s"component $c: more edges than C(n,2)")
      val expected = if (n >= 2) e * 2 * 10000 / (n * (n - 1)) else 0L
      assert(bp === expected)
      if (n === 1L) assert(e === 0L && bp === 0L)
    }
    // same component set on both sides, and member counts tile the user base
    assert(cd.map(_.getAs[Long]("component_id")).toSet === compSizes.keySet)
    assert(cd.map(_.getAs[Long]("n_users")).sum === compSizes.values.sum)
  }

  test("qCoaccessComponents: edges stay within components, ids are minima, sizes reconcile") {
    val comp = ThreatOps.qCoaccessComponents(spark, sf).cache()
    // one row per clean user
    assert(comp.count() ===
      Tables.cleanEvents(spark, sf).select("user_id").distinct().count())
    // every co-access edge's endpoints share a component
    val pairs = ThreatOps.qCoaccessCapped(spark, sf)
      .select(col("user_a"), col("user_b"))
    val a = comp.select(col("user_id").as("user_a"), col("component_id").as("ca"))
    val b = comp.select(col("user_id").as("user_b"), col("component_id").as("cb"))
    assert(pairs.join(a, "user_a").join(b, "user_b")
      .filter(col("ca") =!= col("cb")).count() === 0,
      "a co-access edge crossed two components")
    // component id is the member minimum, and sizes reconcile with members
    val agg = comp.groupBy(col("component_id"))
      .agg(min(col("user_id")).as("min_uid"), count(lit(1)).as("n"),
        first(col("component_size")).as("sz"))
    assert(agg.filter(col("component_id") =!= col("min_uid")).count() === 0)
    assert(agg.filter(col("n") =!= col("sz")).count() === 0)
    comp.unpersist()
  }

  test("qPeerAnomaly: z nonnegative, singleton components score zero, gate matches") {
    val p = ThreatOps.qPeerAnomaly(spark, sf).cache()
    assert(p.count() ===
      Tables.cleanEvents(spark, sf).select("user_id").distinct().count())
    assert(p.filter(col("peer_z") < 0).count() === 0)
    assert(p.filter(col("peer_n") === 1 && col("peer_z") =!= 0.0).count() === 0,
      "a singleton component produced a nonzero peer z-score")
    assert(p.filter((col("peer_z") > 3.0) =!= (col("is_peer_outlier") === 1L))
      .count() === 0)
    p.unpersist()
  }

  test("qCusumDrift: one row per active user, peak is a true window maximum") {
    val df = ThreatOps.qCusumDrift(spark, sf).cache()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() === users)
    assert(df.filter(col("peak_cusum") < 0).count() === 0)
    // n_days reconciles with a direct distinct-day recount
    val direct = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(countDistinct(to_date(col("ts"))).as("dd"))
    val bad = df.join(direct, "user_id").filter(col("n_days") =!= col("dd"))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("qSeasonalBaseline: valid cells, descending z, expected = total/168") {
    val rows = ThreatOps.qSeasonalBaseline(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val zs = rows.map(_.getAs[Double]("z"))
    assert(zs.sameElements(zs.sortBy(-(_: Double))))
    rows.foreach { r =>
      val dow = r.getAs[Long]("day_of_week"); val h = r.getAs[Long]("hour_of_day")
      assert(dow >= 0 && dow <= 6 && h >= 0 && h <= 23)
      assert(r.getAs[Double]("expected") > 0)
    }
  }

  test("qPagerank: ranks form a probability distribution over all graph nodes") {
    val df = ThreatOps.qPagerank(spark, sf).cache()
    val log = Tables.events(spark, sf)
      .withColumn("resource", get_json_object(col("props"), "$.k"))
      .filter(col("resource").isNotNull && col("user_id").isNotNull)
    val nUsers = log.select("user_id").distinct().count()
    val nRes = log.select("resource").distinct().count()
    assert(df.count() === nUsers + nRes)
    assert(df.filter(col("kind") === "user").count() === nUsers)
    // total rank mass ~ 1 (x1000 scale, rounded per node to 4dp)
    val mass = df.agg(sum("rank_x1000")).head.getDouble(0)
    assert(math.abs(mass - 1000.0) < 0.1, s"rank mass $mass")
    // every rank at least the damping floor (1-d)/N
    val floor = 0.15 / (nUsers + nRes) * 1000
    assert(df.filter(col("rank_x1000") < floor * 0.999).count() === 0)
    df.unpersist()
  }

  test("qKnnTriangles: participation mass is divisible by 3 and users are real") {
    val df = ThreatOps.qKnnTriangles(spark, sf).cache()
    assert(df.count() > 0)
    val mass = df.agg(sum("n_triangles")).head.getLong(0)
    assert(mass % 3 === 0, s"3 users per triangle, got mass $mass")
    val known = Tables.events(spark, sf).select("user_id").distinct()
    assert(df.join(known, Seq("user_id"), "left_anti").count() === 0)
    df.unpersist()
  }

  test("qCoaccessJaccard: similarity in (0,1], shared never exceeds either resource set") {
    val rows = ThreatOps.qCoaccessJaccard(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.sameElements(js.sortBy(-(_: Double))))
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
      assert(r.getAs[Long]("shared_resources") >= 2)
    }
  }

  test("qBurstiness: fano non-negative, burstiness index in [-1, 1)") {
    val rows = ThreatOps.qBurstiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 2)
      assert(r.getAs[Double]("mean_daily") > 0)
      assert(r.getAs[Double]("fano") >= -1e-9)
      val b = r.getAs[Double]("burstiness")
      assert(b >= -1.0 && b < 1.0)
    }
  }

  test("qHoltForecast: hand-replayed recursion matches exactly; forecasts are linear in h") {
    val rows = ThreatOps.qHoltForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("horizon_days")).sorted.toSeq === (1L to 7L))
      // linear in h: second differences of the 7 forecasts are ~0
      val f = rs.sortBy(_.getAs[Long]("horizon_days")).map(_.getAs[Double]("forecast"))
      for (i <- 2 until f.length)
        assert(math.abs((f(i) - f(i - 1)) - (f(i - 1) - f(i - 2))) < 2e-4)
    }
    // exact replay for one type
    val et = byType.keys.min
    val daily = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type") === et)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .sortBy(_._1)
    val byDay = daily.toMap
    val series = (daily.head._1 to daily.last._1).map(d => byDay.getOrElse(d, 0L).toDouble)
    var level = series(0); var trend = series(1) - series(0)
    for (y <- series.drop(1)) {
      val prev = level
      level = 0.5 * y + 0.5 * (level + trend)
      trend = 0.25 * (level - prev) + 0.75 * trend
    }
    val expect1 = math.rint((level + trend) * 10000) / 10000
    val got1 = byType(et).find(_.getAs[Long]("horizon_days") == 1L).get
      .getAs[Double]("forecast")
    assert(got1 === expect1)
  }

  test("qHoltWinters: hand-replayed seasonal recursion matches exactly") {
    val rows = ThreatOps.qHoltWinters(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("horizon_days")).sorted.toSeq === (1L to 7L))
    }
    val m = 7
    val et = byType.keys.min
    val daily = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type") === et)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .sortBy(_._1)
    val byDay = daily.toMap
    val series = (daily.head._1 to daily.last._1)
      .map(d => byDay.getOrElse(d, 0L).toDouble).toArray
    assert(series.length >= 2 * m, "fixture must span two weekly seasons")
    val mean1 = series.slice(0, m).sum / m
    val mean2 = series.slice(m, 2 * m).sum / m
    var level = mean1
    var trend = (mean2 - mean1) / m
    val seasonal = Array.tabulate(m)(i => series(i) - mean1)
    for (t <- m until series.length) {
      val y = series(t); val sPrev = seasonal(t % m); val prev = level
      level = 0.5 * (y - sPrev) + 0.5 * (level + trend)
      trend = 0.25 * (level - prev) + 0.75 * trend
      seasonal(t % m) = 0.25 * (y - level) + 0.75 * sPrev
    }
    val got = byType(et).sortBy(_.getAs[Long]("horizon_days"))
      .map(_.getAs[Double]("forecast"))
    for (h <- 1 to m) {
      val expect = math.rint(
        (level + h * trend + seasonal((series.length + h - 1) % m)) * 10000) / 10000
      assert(got(h - 1) === expect, s"horizon $h diverged from the replay")
    }
  }

  test("qAutocorr: lags 1-7 per event type, ACF bounded in [-1, 1]") {
    val rows = ThreatOps.qAutocorr(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      val lags = rs.map(_.getAs[Long]("lag")).sorted
      assert(lags.forall(l => l >= 1 && l <= 7))
      assert(lags.distinct.length === lags.length)
    }
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"ACF out of range: $a")
    }
    // a lag's pair count can never exceed the series length
    val nDays = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts"))).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("n_pairs") < nDays(r.getAs[String]("event_type"))))
  }

  test("qPsi: terms non-negative, shares sum to 1 in each half") {
    val rows = ThreatOps.qPsi(spark, sf).collect()
    assert(rows.nonEmpty)
    // every finite PSI term is >= 0 by construction: (p2-p1) and
    // ln(p2/p1) always share a sign
    rows.filterNot(_.isNullAt(5)).foreach { r =>
      assert(r.getAs[Double]("psi_term") >= 0.0) }
    val pb = rows.map(_.getAs[Double]("p_base")).sum
    val pc = rows.map(_.getAs[Double]("p_cur")).sum
    assert(math.abs(pb - 1.0) < 1e-2 && math.abs(pc - 1.0) < 1e-2)
    rows.foreach(r => assert(
      r.getAs[Long]("n_base") + r.getAs[Long]("n_cur") > 0))
  }

  test("qMarkovSurprisal: non-negative bits, bounded by matrix min-prob") {
    val rows = ThreatOps.qMarkovSurprisal(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_transitions") > 0)
      assert(r.getAs[Double]("avg_surprisal_bits") >= 0.0)
    }
    // the per-user mean can never exceed the surprisal of the rarest
    // transition in the global matrix
    val minP = ThreatOps.qEventTransitions(spark, sf).collect()
      .map(_.getAs[Double]("prob")).filter(_ > 0).min
    val cap = -math.log(minP) / math.log(2) + 0.1
    rows.foreach(r => assert(r.getAs[Double]("avg_surprisal_bits") <= cap))
  }

  test("qHits: both score families present, L1-normalized, non-negative") {
    val rows = ThreatOps.qHits(spark, sf).collect()
    val byKind = rows.groupBy(_.getAs[String]("kind"))
    assert(byKind.keySet === Set("hub", "authority"))
    byKind.foreach { case (kind, rs) =>
      rs.foreach(r => assert(r.getAs[Double]("score_x1000") >= 0.0))
      val tot = rs.map(_.getAs[Double]("score_x1000")).sum
      assert(math.abs(tot - 1000.0) < 1.0, s"$kind scores sum to $tot")
    }
    // node ids carry the kind prefix
    rows.foreach { r =>
      val (node, kind) = (r.getAs[String]("node"), r.getAs[String]("kind"))
      assert(if (kind == "hub") node.startsWith("u") else node.startsWith("r"))
    }
  }

  test("qSeasonalDecompose: additive identity holds, trend nulls only at edges") {
    val rows = ThreatOps.qSeasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(4)).foreach { r =>
      val recomposed = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(recomposed - r.getAs[Long]("n")) < 2e-3,
        s"decomposition does not re-add to the observation: $r")
    }
    // a 7-row centered MA is undefined exactly at the first/last 3 rows
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[String]("day"))
      val nullIdx = sorted.zipWithIndex.filter(_._1.isNullAt(4)).map(_._2)
      val n = sorted.length
      assert(nullIdx.forall(i => i < 3 || i >= n - 3))
    }
  }

  test("qChi2: terms non-negative, statistic matches a hand-built contingency table") {
    val rows = ThreatOps.qChi2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
    // rebuild the contingency table from raw events and recompute chi2
    val cells = Tables.cleanEvents(spark, sf)
      .select(col("event_type"),
        when(hour(col("ts")) < 8 || hour(col("ts")) > 18, 1L).otherwise(0L)
          .as("ah"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nt"), sum(col("ah")).as("na"))
      .collect().map(r => (r.getAs[Long]("nt"), r.getAs[Long]("na")))
    val t = cells.map(_._1).sum.toDouble
    val a = cells.map(_._2).sum.toDouble
    val expect = cells.map { case (nt, na) =>
      val eAh = nt * a / t; val eBh = nt * (t - a) / t
      val dev = na - eAh
      dev * dev * (1.0 / eAh + 1.0 / eBh)
    }.sum
    val got = rows.map(_.getAs[Double]("chi2_term")).sum
    assert(math.abs(got - expect) < 1e-2,
      s"chi2 sum $got diverges from the replayed $expect")
  }

  /** The capped co-access pair graph rebuilt independently of the
    * operators (mirrors the oracle's ur/keep/pr CTEs) — qCoaccessCapped
    * itself is a top-100 presentation and can't serve as a replay edge
    * set. sf0.001-sized, collected whole.
    */
  private def replayPairs(): Array[(Long, Long)] = {
    val ur = Tables.cleanEvents(spark, sf)
      .select(col("user_id"), get_json_object(col("props"), "$.k").as("res"))
      .filter(col("res").isNotNull).distinct()
    val keep = ur.groupBy("res").count().filter(col("count") <= 1000).select("res")
    val a = ur.join(keep, "res").withColumnRenamed("user_id", "ua")
    val b = ur.join(keep, "res").withColumnRenamed("user_id", "ub")
    a.join(b, Seq("res")).filter(col("ua") < col("ub"))
      .groupBy("ua", "ub").count().filter(col("count") >= 2)
      .select("ua", "ub").collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("qAssortativity matches a literal Pearson replay over the pair graph") {
    val out = ThreatOps.qAssortativity(spark, sf).collect()
    assert(out.length === 1)
    val (nEdges, r) = (out(0).getLong(0), out(0).getDouble(1))
    assert(r >= -1.0001 && r <= 1.0001, s"assortativity $r outside [-1,1]")
    // literal replay: symmetrize, per-node degree, Pearson over endpoints
    val pairs = replayPairs()
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    assert(nEdges === edges.length.toLong)
    if (edges.nonEmpty) {
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
      val xy = edges.map { case (a, b) => (deg(a), deg(b)) }
      val n = xy.length.toDouble
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val syy = xy.map(p => p._2 * p._2).sum
      val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      val expected = if (den == 0.0) 0.0 else (n * sxy - sx * sy) / den
      assert(math.abs(r - expected) < 5e-4,
        s"assortativity $r diverges from replay $expected")
    } else assert(r === 0.0)
  }

  test("qBlastRadius matches an in-process BFS replay over the same edges") {
    val out = ThreatOps.qBlastRadius(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // replay: same capped pair graph + same top-10 seeds, literal BFS
    val edges = replayPairs()
      .flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = Tables.cleanEvents(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id").asc).limit(10)
      .collect().map(_.getLong(0))
    val expect = seeds.flatMap { s =>
      var hop = Map(s -> 0L)
      var frontier = Set(s)
      for (h <- 1L to 3L) {
        frontier = frontier.flatMap(u => edges.getOrElse(u, Set.empty))
          .filterNot(hop.contains)
        hop ++= frontier.map(_ -> h)
      }
      hop.map { case (u, h) => (s, u, h) }
    }.toSet
    assert(out === expect, "BFS result diverges from the literal replay")
    assert(out.count(_._3 == 0L) === 10, "hop-0 rows must be the 10 seeds")
  }

  test("qDegreeDist buckets are exact log2 bins and cover every clean user") {
    val d = ThreatOps.qDegreeDist(spark, sf).collect()
    val users = Tables.cleanEvents(spark, sf).select("user_id").distinct().count()
    assert(d.map(_.getAs[Long]("n_users")).sum === users,
      "bucket user counts must partition the clean-user universe")
    for (r <- d) {
      val (b, lo, hi) = (r.getAs[Long]("bucket"),
        r.getAs[Long]("min_degree"), r.getAs[Long]("max_degree"))
      if (b == -1L) assert(lo == 0L && hi == 0L)
      else {
        assert(lo >= (1L << b) && hi < (1L << (b + 1)),
          s"bucket $b holds degrees [$lo,$hi] outside [2^$b, 2^${b + 1})")
      }
    }
    // degrees reconcile with an independent replay of the pair graph.
    // maxOption: an all-isolated fixture has NO pairs — that case must
    // fail (or pass) as a readable assertion on the -1 bucket, not crash
    // with UnsupportedOperationException on an empty .max.
    val pairDeg = replayPairs().flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).values.map(_.length.toLong).maxOption
    val gridMax = d.filter(_.getLong(0) >= 0)
      .map(_.getAs[Long]("max_degree")).maxOption
    pairDeg match {
      case Some(p) => assert(gridMax.contains(p),
        s"max bucketed degree $gridMax diverges from replay degree $p")
      case None =>
        assert(gridMax.isEmpty, "no replay pairs but non-isolated buckets exist")
        assert(d.map(_.getAs[Long]("n_users")).sum ===
          d.filter(_.getLong(0) == -1L).map(_.getAs[Long]("n_users")).sum,
          "with no pairs, every user must land in the isolated (-1) bucket")
    }
  }

  test("qHandoffPairs matches a literal first-touch replay") {
    val out = ThreatOps.qHandoffPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ft = Tables.cleanEvents(spark, sf)
      .select(col("user_id"), get_json_object(col("props"), "$.k").as("res"),
        unix_micros(col("ts")).as("us"))
      .filter(col("res").isNotNull)
      .groupBy("user_id", "res").agg(min("us").as("first_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    for ((_, rows) <- ft.groupBy(_._2) if rows.length <= 1000;
         a <- rows; b <- rows
         if a._1 != b._1 && b._3 > a._3 && b._3 - a._3 <= 3600000000L)
      counts((a._1, b._1)) += 1L
    val expTop = counts.toSeq
      .sortBy { case ((f, t), n) => (-n, f, t) }.take(50)
      .map { case ((f, t), n) => (f, t, n) }
    assert(out === expTop, "handoff top-50 diverges from the literal replay")
  }

  test("qRiskPropagation: exposure bounded by 10^4 x max user risk, ordered") {
    val out = ThreatOps.qRiskPropagation(spark, sf).collect()
    assert(out.length <= 50 && out.nonEmpty)
    val exps = out.map(_.getAs[Long]("exposure_bp"))
    assert(exps.zip(exps.tail).forall { case (a, b) => a >= b },
      "rows must be ordered by exposure desc")
    assert(exps.forall(_ >= 0L))
    // a resource's mean risk can never exceed its riskiest user's risk
    val maxRisk = Tables.cleanEvents(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(hour(col("ts")) < 8 || hour(col("ts")) > 18, 1L)
        .otherwise(0L)).as("r"))
      .agg(max("r")).first().getLong(0)
    assert(exps.forall(_ <= 10000L * maxRisk))
  }
}
