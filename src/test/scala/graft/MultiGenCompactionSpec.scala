package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-generation compaction idempotence — the last untested seam of
  * the incremental-dedup production loop: three daily shards chained
  * through probe→compact must land on an index generation whose CONTENT
  * digest equals (a) a from-scratch build over the full corpus and
  * (b) a single-shot compaction of the union shard. Together those say
  * the fold is associative and order-independent, so a deployment can
  * compact daily forever without drifting from the batch-rebuild truth
  * ([[DedupOps.qDedupIndexCompact]]'s oracle certifies ONE generation;
  * this spec certifies the chain).
  */
class MultiGenCompactionSpec extends SparkSpec {

  private def digest(path: String): Seq[(Long, Long, Long, Long, String)] =
    DedupOps.indexDigest(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq

  private def writeIndex(d: DataFrame, path: String): Unit = {
    DedupOps.bandRows(d).write.mode("overwrite").parquet(s"$path/bands")
    DedupOps.sigRows(d).write.mode("overwrite").parquet(s"$path/sigs")
  }

  test("three chained compaction generations digest-equal the from-scratch build and the one-shot fold") {
    val mod = DedupOps.IncrementalShardMod
    val root = java.nio.file.Files.createTempDirectory("graft-multigen").toString
    try {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).cache()
    val hist = docs.filter(col("doc_id") % mod =!= 0)
    val shardAll = docs.filter(col("doc_id") % mod === 0)
    // three "daily" shards partitioning the incremental split
    val shards = (0 until 3).map(i => shardAll.filter(
      pmod(floor(col("doc_id") / lit(mod)).cast("long"), lit(3)) === i))
    assert(shards.forall(_.count() > 0), "each daily shard must be non-empty")
    assert(shards.map(_.count()).sum === shardAll.count())

    writeIndex(hist, s"$root/gen0")
    // the production loop: probe the day's shard, then fold it in
    var live = s"$root/gen0"
    for (i <- 0 until 3) {
      val probe = DedupOps.incrementalPairs(spark, shards(i), live).collect()
      assert(probe.forall { r =>
        val j = r.getDouble(3); j >= 0.0 && j <= 1.0 })
      val next = s"$root/gen${i + 1}"
      DedupOps.compactIndex(spark, live, shards(i), next)
      live = next
    }
    val chained = digest(live)
    // (a) generation 3 ≡ from-scratch build of the full corpus
    writeIndex(docs, s"$root/scratch")
    assert(chained === digest(s"$root/scratch"),
      "gen3 must digest-equal a from-scratch build of the full corpus")
    // (b) fold order-independence: the one-shot union fold lands identically
    DedupOps.compactIndex(spark, s"$root/gen0", shardAll, s"$root/oneshot")
    assert(chained === digest(s"$root/oneshot"),
      "chained daily folds must equal the single-shot union fold")
    // atomic publish left no staging residue behind any generation
    val leftovers = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.endsWith(".inprogress"))
    assert(leftovers.isEmpty,
      s"staging dirs must be renamed away: ${leftovers.mkString(",")}")
    docs.unpersist()
    // the 4 index generations + scratch/oneshot builds would otherwise
    // leak under java.io.tmpdir every run (r15 advisory)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("ensureIndex: two threads racing the first build serialize on the per-path monitor") {
    // fresh fixture dir => fresh content fingerprint => no pre-existing
    // index or marker, so BOTH threads genuinely race the first build
    // (r14 advisory: the loser used to be able to delete the winner's
    // just-renamed live index while clearing the "legacy" path)
    val root = java.nio.file.Files.createTempDirectory("graft-racebuild").toString
    try {
    Tables.documents(spark, sf).limit(40)
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try results.add(DedupOps.ensureIndex(spark, root))
        catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"racing builds threw: ${errors.peek()}")
    val paths = results.toArray(Array.empty[String]).distinct
    assert(paths.length === 1, s"both threads must return the same path, got ${paths.toSeq}")
    val p = paths.head
    // the published index is COMPLETE: both sides + marker, no staging residue
    assert(new java.io.File(s"$p/bands").isDirectory && new java.io.File(s"$p/sigs").isDirectory)
    assert(new java.io.File(s"$p/_built").isFile)
    assert(!new java.io.File(s"$p.inprogress").exists())
    assert(spark.read.parquet(s"$p/bands").count() > 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }
}
