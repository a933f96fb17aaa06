package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariants of the iid amplification fixture ([[ScaleProbe.amplify]],
  * mode = "iid") — the fixture every iid slope read rests on. The gate's
  * value is exactly the generator being what its `fixture` string claims,
  * so each claim is asserted here and a generator bug fails loudly
  * instead of silently weakening every future slope:
  *
  *  - token (hence word-shingle) spaces are DISJOINT across copies;
  *  - each copy's token-frequency multiset is a bijective image of the
  *    base corpus's (length profile and Zipf shape preserved exactly);
  *  - copied vectors are perturbed BELOW the 0.9 SemDeDup τ but stay
  *    recognizably near their source (a new nearby point, not a clone
  *    and not noise);
  *  - FK edges stay key-correct after the per-copy stride;
  *  - the events graph is F disjoint clones with per-resource degree
  *    distribution preserved;
  *  - a copyOffset=r single-copy REPLICA reproduces the ×F fixture's
  *    copy r bit-for-bit (the property the replica-mean base estimator
  *    rests on).
  */
class IidFixtureSpec extends SparkSpec {

  private val factor = 3
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_iid_spec").toString
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)); ()
    }
    ScaleProbe.amplify(spark, sf, d, factor, "iid")
    d
  }
  private def copyOf(c: org.apache.spark.sql.Column) = (c / ScaleProbe.Stride).cast("long")

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)

  test("iid fixture: row counts amplify by the factor with strided keys") {
    val base = Tables.documents(spark, sf).count()
    val amp = Tables.documents(spark, dir)
    assert(amp.count() === base * factor)
    // every copy holds exactly the base population
    val perCopy = amp.groupBy(copyOf(col("doc_id")).as("c")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perCopy === (0 until factor).map(c => c.toLong -> base).toMap)
    assert(Tables.embeddings(spark, dir).count() ===
      Tables.embeddings(spark, sf).count() * factor)
    assert(Tables.events(spark, dir).count() ===
      Tables.events(spark, sf).count() * factor)
  }

  test("iid fixture: token spaces are disjoint across copies") {
    val tk = tokens(Tables.documents(spark, dir))
      .select(copyOf(col("doc_id")).as("c"), col("tok")).distinct()
    val copiesPerToken = tk.groupBy(col("tok"))
      .agg(countDistinct(col("c")).as("nc"))
      .filter(col("nc") > 1)
    assert(copiesPerToken.count() === 0,
      "a token shared by two copies breaks the disjoint-shingle-space claim")
  }

  test("iid fixture: each copy's token-frequency multiset equals the base's " +
      "(length profile + Zipf shape preserved)") {
    // The per-copy suffix is a bijection on tokens, so the SORTED
    // frequency vector must match the base corpus's exactly, copy by copy.
    def freqVector(tk: DataFrame, group: Seq[String]): DataFrame =
      tk.groupBy((col("tok") +: group.map(col)): _*).agg(count(lit(1)).as("f"))
    val baseFreqs = freqVector(tokens(Tables.documents(spark, sf)), Nil)
      .groupBy(col("f")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ampFreqs = freqVector(
        tokens(Tables.documents(spark, dir))
          .select(col("tok"), copyOf(col("doc_id")).as("c")), Seq("c"))
      .groupBy(col("c"), col("f")).count().collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
    for (c <- 0 until factor)
      assert(ampFreqs(c.toLong) === baseFreqs,
        s"copy $c's token-frequency histogram diverged from the base corpus")
    // and per-document token counts are preserved (length profile)
    val baseLens = tokens(Tables.documents(spark, sf))
      .groupBy(col("doc_id")).count()
      .withColumnRenamed("count", "base_n")
    val ampLens = tokens(Tables.documents(spark, dir))
      .groupBy(col("doc_id")).count()
      .select((col("doc_id") % ScaleProbe.Stride).as("doc_id"),
        col("count").as("amp_n"))
    assert(ampLens.join(baseLens, "doc_id")
      .filter(col("amp_n") =!= col("base_n")).count() === 0)
  }

  test("iid fixture: perturbed vectors sit near but below the 0.9 SemDeDup τ") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("bid"), col("embedding").as("be"))
    val amp = Tables.embeddings(spark, dir)
      .select((col("vec_id") % ScaleProbe.Stride).as("bid"),
        copyOf(col("vec_id")).as("c"), col("embedding").as("ae"))
    val cos = amp.join(base, "bid").select(col("c"),
      (aggregate(zip_with(col("ae"), col("be"), (a, b) => a * b),
          lit(0.0d), (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("ae"), a => a * a), lit(0.0d), (acc, x) => acc + x)) *
         sqrt(aggregate(transform(col("be"), b => b * b), lit(0.0d), (acc, x) => acc + x))))
        .as("cos"))
    val stats = cos.agg(min(col("cos")), max(col("cos")), avg(col("cos"))).head()
    val (lo, hi, mean) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    assert(hi < 0.98, s"a near-clone survived the perturbation (max cos $hi)")
    assert(lo > 0.5, s"perturbation destroyed locality (min cos $lo)")
    assert(mean > 0.75 && mean < 0.92, s"mean cosine drifted to $mean (~0.85 claimed)")
    // the fold split the suite's held-out logic keys on must survive
    assert(ScaleProbe.Stride % 5 === 0)
  }

  test("iid fixture: FK edges stay key-correct after the stride") {
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
      fact.select(col(fk)).distinct()
        .join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti").count()
    assert(orphans(Tables.orders(spark, dir), "o_custkey",
      Tables.customer(spark, dir), "c_custkey") === 0)
    assert(orphans(Tables.lineitem(spark, dir), "l_orderkey",
      Tables.orders(spark, dir), "o_orderkey") === 0)
    assert(orphans(Tables.lineitem(spark, dir), "l_partkey",
      Tables.part(spark, dir), "p_partkey") === 0)
    assert(orphans(Tables.lineitem(spark, dir), "l_suppkey",
      Tables.supplier(spark, dir), "s_suppkey") === 0)
    assert(orphans(Tables.customer(spark, dir), "c_nationkey",
      Tables.nation(spark, dir), "n_nationkey") === 0)
  }

  test("iid fixture: events graph is F disjoint clones with degree " +
      "distribution preserved") {
    def edges(d: String): DataFrame = Tables.cleanEvents(spark, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("res"))
      .filter(col("res").isNotNull)
    val amp = edges(dir)
    // resources are strided: each amplified resource belongs to exactly
    // the copy its user belongs to (no cross-copy edge anywhere)
    assert(amp.filter(copyOf(col("res")) =!= copyOf(col("user_id"))).count() === 0)
    // per-resource degree multiset equals the base graph's, copy by copy
    val baseDeg = edges(sf).groupBy(col("res")).count()
      .withColumnRenamed("count", "base_deg")
    val ampDeg = amp.groupBy(col("res")).count()
      .select((col("res") % ScaleProbe.Stride).as("res"),
        copyOf(col("res")).as("c"), col("count").as("amp_deg"))
    assert(ampDeg.join(baseDeg, "res")
      .filter(col("amp_deg") =!= col("base_deg")).count() === 0)
    assert(ampDeg.join(baseDeg, Seq("res"), "left_anti").count() === 0)
  }

  test("iid fixture: a copyOffset replica reproduces the fixture's copy " +
      "draw bit-for-bit") {
    val repDir = java.nio.file.Files.createTempDirectory("graft_iid_rep").toString
    try {
      ScaleProbe.amplify(spark, sf, repDir, 1, "iid", copyOffset = 2)
      // documents: identical (doc_id, text) set as the x3 fixture's copy 2
      val rep = Tables.documents(spark, repDir).select(col("doc_id"), col("text"))
      val fix = Tables.documents(spark, dir)
        .filter(copyOf(col("doc_id")) === 2).select(col("doc_id"), col("text"))
      assert(rep.exceptAll(fix).count() === 0 && fix.exceptAll(rep).count() === 0)
      // embeddings: identical vectors (float-exact — same expression tree)
      val repE = Tables.embeddings(spark, repDir)
        .select(col("vec_id"), col("embedding").cast("string").as("e"))
      val fixE = Tables.embeddings(spark, dir)
        .filter(copyOf(col("vec_id")) === 2)
        .select(col("vec_id"), col("embedding").cast("string").as("e"))
      assert(repE.exceptAll(fixE).count() === 0 && fixE.exceptAll(repE).count() === 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(repDir)); ()
    }
  }
}
