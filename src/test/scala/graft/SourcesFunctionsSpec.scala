package graft

import java.nio.file.Files

import graft.sources.LogSources
import org.apache.spark.sql.functions._

class SourcesFunctionsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("readActivityCsv parses the reference log shape, coercing bad timestamps") {
    val dir = tmpDir("csv")
    Files.writeString(java.nio.file.Paths.get(s"$dir/log.csv"),
      """timestamp,user,pc,activity,resource
        |2024-03-04 09:15:00,alice,pc-1,login,srv-a
        |not-a-date,bob,pc-2,file_copy,srv-b
        |2024-03-09 22:30:00,carol,pc-3,email,srv-c
        |2024-03-05 10:00:00,,pc-4,login,srv-d
        |""".stripMargin)
    val raw = LogSources.readActivityCsv(spark, s"$dir/log.csv")
    assert(raw.count() === 4)
    assert(raw.filter(col("timestamp").isNull).count() === 1) // coerced
    val pre = LogSources.preprocessActivity(raw).cache()
    assert(pre.count() === 2) // null ts + null user dropped
    val carol = pre.filter(col("user") === "carol").head()
    assert(carol.getAs[Long]("hour_of_day") === 22L)
    assert(carol.getAs[Long]("is_weekend") === 1L)  // 2024-03-09 is Saturday
    assert(carol.getAs[Long]("is_after_hours") === 1L)
    pre.unpersist()
  }

  test("readEventsJsonl applies the events schema without inference") {
    val dir = tmpDir("jsonl")
    Files.writeString(java.nio.file.Paths.get(s"$dir/e.jsonl"),
      """{"event_id":1,"ts":"2024-03-04T09:15:00Z","user_id":7,"event_type":"login","value":1.5,"props":"{\"k\":\"srv-a\"}"}
        |{"event_id":2,"ts":"2024-03-04T09:20:00Z","user_id":7,"event_type":"write","value":2.5,"props":"{\"k\":\"srv-b\"}"}
        |""".stripMargin)
    val df = LogSources.readEventsJsonl(spark, s"$dir/e.jsonl")
    assert(df.schema === LogSources.eventsJsonSchema)
    assert(df.agg(sum("value")).head.getDouble(0) === 4.0)
  }

  test("writeDatePartitioned lays out daily partitions that prune") {
    val out = tmpDir("part") + "/events"
    val ev = Tables.events(spark, sf).limit(500)
    LogSources.writeDatePartitioned(ev, "ts", out)
    val back = spark.read.parquet(out)
    assert(back.count() === 500)
    val oneDay = back.select("event_date").distinct().head.getDate(0)
    val pruned = back.filter(col("event_date") === lit(oneDay))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"),
      s"expected partition pruning:\n$scan")
  }

  test("compactDatePartitioned merges small files, preserves rows, stays idempotent") {
    val out = tmpDir("compact") + "/events"
    val ev = Tables.events(spark, sf).limit(2000)
    // simulate a micro-batch writer: 12 small files per daily partition
    LogSources.writeDatePartitioned(ev.repartition(12), "ts", out)
    val rowsBefore = spark.read.parquet(out).count()
    val sumBefore = spark.read.parquet(out)
      .agg(sum(col("event_id"))).head.getLong(0)
    val (n1, before, after) =
      LogSources.compactDatePartitioned(spark, out, targetBytes = 512L * 1024 * 1024)
    assert(n1 > 0, "at least one partition should need compaction")
    assert(after < before, s"file count must drop ($before -> $after)")
    // content identical, partition pruning intact
    val back = spark.read.parquet(out)
    assert(back.count() === rowsBefore)
    assert(back.agg(sum(col("event_id"))).head.getLong(0) === sumBefore)
    val oneDay = back.select("event_date").distinct().head.getDate(0)
    val scan = back.filter(col("event_date") === lit(oneDay))
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"))
    // steady state: a second pass finds nothing to rewrite
    val (n2, b2, a2) =
      LogSources.compactDatePartitioned(spark, out, targetBytes = 512L * 1024 * 1024)
    assert(n2 === 0 && b2 === a2 && b2 === after)
  }

  test("compactDatePartitioned recovers every mid-compaction kill state to the uninterrupted result") {
    // The staged-swap sequence is: write staged → create commit marker →
    // rm(old dir) → rename(staged, old). A kill can land in any gap; this
    // spec CONSTRUCTS each resulting on-disk state deterministically
    // (same ops the production path runs, stopped at the kill point — no
    // racing threads) and asserts the next compactDatePartitioned run
    // lands on rows/content/file-layout identical to a compaction that
    // was never interrupted. Mirrors the CDC sink's crash-restart proof
    // (EventStreamSpec) for the last sink-mutation path without one.
    import java.io.File
    def freshDataset(): String = {
      val out = tmpDir("compact-kill") + "/events"
      LogSources.writeDatePartitioned(
        Tables.events(spark, sf).limit(2000).repartition(12), "ts", out)
      out
    }
    def fingerprint(root: String): (Long, Long) = {
      val df = spark.read.parquet(root)
      (df.count(), df.agg(sum(col("event_id"))).head.getLong(0))
    }
    def partDirs(root: String): Array[File] =
      new File(root).listFiles().filter(d =>
        d.isDirectory && d.getName.contains("=") &&
          !d.getName.startsWith(".") && !d.getName.startsWith("_"))
    def rmRec(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
      f.delete(); ()
    }
    // the truth: an uninterrupted compaction of the same dataset
    val clean = freshDataset()
    val (cleanRows, cleanSum) = fingerprint(clean)
    val (_, _, cleanAfter) =
      LogSources.compactDatePartitioned(spark, clean, targetBytes = 512L * 1024 * 1024)
    // stage a victim partition exactly as the production path does,
    // stopped before the marker (withMarker=false) or after (true)
    def stage(root: String, withMarker: Boolean): (File, File) = {
      val d = partDirs(root).head
      val staged = new File(root, s"${LogSources.StagePrefix}${d.getName}")
      spark.read.parquet(d.getAbsolutePath).repartition(1)
        .write.mode("overwrite").parquet(staged.getAbsolutePath)
      if (withMarker)
        assert(new File(staged, LogSources.CommitMarker).createNewFile())
      (d, staged)
    }
    val killStates: Seq[(String, String => Unit)] = Seq(
      "mid staged write (partial staging, no marker)" -> { root =>
        val (_, staged) = stage(root, withMarker = false)
        // half-written staging: drop one of its files mid-flight
        staged.listFiles().filter(_.getName.endsWith(".parquet")).headOption
          .foreach(_.delete())
      },
      "between staged write and marker" -> { root =>
        stage(root, withMarker = false); ()
      },
      "between marker and rm(old)" -> { root =>
        stage(root, withMarker = true); ()
      },
      "mid rm(old) — target half-deleted" -> { root =>
        val (d, _) = stage(root, withMarker = true)
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .take(6).foreach(_.delete())
      },
      "between rm(old) and rename — target gone" -> { root =>
        val (d, _) = stage(root, withMarker = true)
        rmRec(d)
      })
    for ((label, inject) <- killStates) {
      val root = freshDataset()
      inject(root)
      val (_, _, after) =
        LogSources.compactDatePartitioned(spark, root, targetBytes = 512L * 1024 * 1024)
      assert(fingerprint(root) === ((cleanRows, cleanSum)),
        s"rows/content diverged after recovery from kill $label")
      assert(after === cleanAfter,
        s"file layout diverged after recovery from kill $label ($after vs $cleanAfter)")
      assert(!new File(root).listFiles().exists(_.getName.startsWith(LogSources.StagePrefix)),
        s"staging residue left behind after kill $label")
      assert(partDirs(root).forall(d => !new File(d, LogSources.CommitMarker).exists()),
        s"commit-marker residue left behind after kill $label")
      // partition pruning still intact on the recovered dataset
      val oneDay = spark.read.parquet(root).select("event_date").distinct().head.getDate(0)
      val scan = spark.read.parquet(root).filter(col("event_date") === lit(oneDay))
        .queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [isnotnull(event_date"))
    }
  }

  test("ORC round-trip preserves events and pushes filters to the scan") {
    val out = tmpDir("orc") + "/events"
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value").limit(500)
    LogSources.writeOrc(ev.withColumn("props", lit(null).cast("string")), out)
    val back = LogSources.readEventsOrc(spark, out)
    assert(back.count() === 500)
    assert(back.select("event_id").exceptAll(ev.select("event_id")).count() === 0)
    val filtered = back.filter(col("user_id") === 7L).select("event_id", "user_id")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"expected ORC predicate pushdown:\n$scan")
    assert(scan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint"),
      s"expected column pruning to 2 columns:\n$scan")
  }

  test("writeRangeClustered: every output file covers a disjoint key range") {
    val out = tmpDir("rangeclust") + "/events"
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    LogSources.writeRangeClustered(ev, "user_id", files = 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() === ev.count())
    // per-file (min, max) of the cluster key must not overlap: that is
    // what lets parquet footer min/max stats skip whole files on a
    // user_id predicate
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "need multiple files to demonstrate layout")
    // STRICT inequality: RangePartitioner never splits one key across
    // partitions, so adjacent files must not even share a boundary key —
    // a shared key would force a point predicate to read both files
    ranges.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA < loB, s"file ranges overlap or share a key: $ranges")
    }
  }

  test("writeBucketed produces a shuffle-free bucketed aggregation") {
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    // a previously-crashed run can leave the managed location behind
    val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), "events_bucketed")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    LogSources.writeBucketed(
      Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type"),
      "user_id", 8, "events_bucketed")
    val agg = spark.table("events_bucketed").groupBy("user_id").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$plan")
  }

  test("cosine_sim / dot_prod are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT round(cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)), 4) AS c0,
                round(cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)), 4) AS c1,
                dot_prod(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d
      """).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 32.0)
  }

  test("SQL shingle_hash32 agrees with the Column API") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(20).createOrReplaceTempView("docs_test")
    val viaSql = spark.sql(
      "SELECT doc_id, shingle_hash32(text, 3) AS hs FROM docs_test")
    val viaApi = Tables.documents(spark, sf).limit(20)
      .select(col("doc_id"),
        graft.functions.ShingleHash32(col("text"), 3).as("hs"))
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("SQL shingle_hash32 accepts BIGINT k and rejects non-literal k clearly") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_k_test")
    // BIGINT literal folds to the same kernel as an INT literal
    val viaLong = spark.sql(
      "SELECT doc_id, shingle_hash32(text, CAST(3 AS BIGINT)) AS hs FROM docs_k_test")
    val viaInt = spark.sql(
      "SELECT doc_id, shingle_hash32(text, 3) AS hs FROM docs_k_test")
    assert(viaLong.exceptAll(viaInt).count() === 0)
    // a non-foldable k fails at analysis with a named-function message
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT shingle_hash32(text, length(text)) FROM docs_k_test").collect()
    }
    assert(ex.getMessage.contains("shingle_hash32"))
  }

  test("SQL shingle_hash32 rejects k < 1 in every integral width") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_k0_test")
    for (kLit <- Seq("0", "-1", "CAST(0 AS BIGINT)", "CAST(0 AS SMALLINT)",
        "CAST(-2 AS TINYINT)")) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          s"SELECT shingle_hash32(text, $kLit) FROM docs_k0_test").collect()
      }
      assert(ex.getMessage.contains("shingle_hash32"), s"k=$kLit")
    }
  }

  test("SQL cosine_sim agrees with the Column API on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    e.createOrReplaceTempView("emb_test")
    val viaSql = spark.sql(
      """SELECT a.vec_id va, b.vec_id vb,
                round(cosine_sim(a.embedding, b.embedding), 4) c
         FROM emb_test a JOIN emb_test b ON a.vec_id < b.vec_id""")
    val viaApi = {
      val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
      a.join(b, col("va") < col("vb"))
        .select(col("va"), col("vb"),
          round(graft.functions.VectorExpressions.cosineSim(col("ea"), col("eb")), 4).as("c"))
    }
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("writeZOrdered: every file covers a sub-rectangle on BOTH dims; single-key sort does not") {
    val s = spark
    val base = Tables.cleanEvents(spark, sf)
      .select(col("user_id"),
        datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day_idx"))
      .filter(col("day_idx") >= 0)
    val zDir = Files.createTempDirectory("graft-zorder").toFile.getAbsolutePath
    val rDir = Files.createTempDirectory("graft-range1d").toFile.getAbsolutePath
    LogSources.writeZOrdered(base, "user_id", "day_idx", bits = 8, files = 16, zDir)
    LogSources.writeRangeClustered(base, "user_id", 16, rDir)
    def extents(dir: String): Array[((Double, Double), (Double, Double))] =
      s.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(min("user_id").cast("double").as("ulo"), max("user_id").cast("double").as("uhi"),
          min("day_idx").cast("double").as("dlo"), max("day_idx").cast("double").as("dhi"))
        .collect()
        .map(r => ((r.getAs[Double]("ulo"), r.getAs[Double]("uhi")),
          (r.getAs[Double]("dlo"), r.getAs[Double]("dhi"))))
    // operational claim, asserted the way a reader would use the footer
    // stats: how many files could a single-dimension point predicate
    // skip? (file skipped ⇔ point outside the file's [min,max] interval)
    def filesHit(ranges: Array[((Double, Double), (Double, Double))],
        dim: Int, point: Double): Int =
      ranges.count { case ((ulo, uhi), (dlo, dhi)) =>
        if (dim == 0) ulo <= point && point <= uhi
        else dlo <= point && point <= dhi
      }
    val medUser = base.stat.approxQuantile("user_id", Array(0.5), 0.0)(0)
    val medDay = base.stat.approxQuantile("day_idx", Array(0.5), 0.0)(0)
    // each layout's thresholds scale by ITS OWN file count —
    // repartitionByRange may emit different counts for the two layouts
    val zR = extents(zDir); val rR = extents(rDir)
    val zn = zR.length; val rn = rR.length
    // 1-D user sort: near-perfect skipping on user, NONE on day
    assert(filesHit(rR, 0, medUser) <= 2,
      "1-D layout should isolate a user to <= 2 files")
    assert(filesHit(rR, 1, medDay) >= (7 * rn) / 8,
      "1-D layout can't meaningfully skip on the unsorted day dim")
    // Z-order: meaningful skipping on BOTH dims (neither is perfect,
    // neither is zero — that's the trade the curve makes)
    assert(filesHit(zR, 0, medUser) <= (3 * zn) / 4,
      s"Z-order skips nothing on user: ${filesHit(zR, 0, medUser)}/$zn files hit")
    assert(filesHit(zR, 1, medDay) <= (3 * zn) / 4,
      s"Z-order skips nothing on day: ${filesHit(zR, 1, medDay)}/$zn files hit")
  }

  test("RewriteIntersectSize: size∘array_intersect plans the fused kernel, same answers") {
    val s = spark
    import s.implicits._
    // dups, disjoint, empty, and both-sides-null cases
    val df = Seq(
      (1, Seq[Option[Int]](Some(1), Some(2), Some(2), Some(3)),
        Seq[Option[Int]](Some(2), Some(3), Some(3), Some(4))),
      (2, Seq[Option[Int]](Some(1)), Seq[Option[Int]](Some(9))),
      (3, Seq[Option[Int]](), Seq[Option[Int]](Some(1))),
      (4, Seq[Option[Int]](Some(1), None, Some(2)), Seq[Option[Int]](None, Some(3))),
      (5, Seq[Option[Int]](None), Seq[Option[Int]](Some(5)))
    ).toDF("id", "a", "b")
    // repartition keeps ConvertToLocalRelation from folding the literal
    // frame into a pre-evaluated LocalTableScan (which would hide the
    // expression from the physical plan entirely)
    val out = df.repartition(2)
      .select(col("id"), expr("size(array_intersect(a, b))").as("n"))
    assert(out.queryExecution.executedPlan.toString.contains("intersect_size"),
      "optimizer rule did not fire on the registered session")
    assert(out.orderBy("id").collect().map(_.getInt(1)).toSeq === Seq(2, 0, 0, 1, 0))
  }

  test("contentFingerprint: recursive over nested files, change-sensitive, fail-fast on missing paths") {
    val root = java.nio.file.Files.createTempDirectory("graft-fp").toString
    def write(rel: String, body: String): Unit = {
      val p = java.nio.file.Paths.get(root, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    }
    // partitioned-table shape: data files live in nested part dirs
    write("day=1/part-0.parquet", "aaaa")
    write("day=2/part-0.parquet", "bbbb")
    val fp1 = Tables.contentFingerprint(root)
    assert(fp1 === Tables.contentFingerprint(root), "fingerprint must be deterministic")
    // a nested file's CONTENT change (size delta) must change the
    // fingerprint even though the top-level dir listing is unchanged —
    // the r14 advisory case the shallow listing missed
    write("day=2/part-0.parquet", "bbbbbb")
    val fp2 = Tables.contentFingerprint(root)
    assert(fp2 !== fp1, "nested content change must produce a new fingerprint")
    // a new nested file also changes it
    write("day=3/part-0.parquet", "cccc")
    assert(Tables.contentFingerprint(root) !== fp2)
    // missing path: loud error, never a constant key
    val e = intercept[IllegalArgumentException] {
      Tables.contentFingerprint(s"$root/nonexistent.parquet")
    }
    assert(e.getMessage.contains("does not exist"))
  }
}
