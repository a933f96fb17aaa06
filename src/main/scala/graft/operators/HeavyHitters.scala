package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate frequent items (heavy hitters) via distributed
  * Space-Saving — the bounded-memory answer to "top resources / top
  * talkers" when the key space is too large to hash-aggregate exactly.
  *
  * Why not a plain groupBy + top-k? Exact counting shuffles EVERY
  * distinct key; at 100 TB with billions of distinct resources the
  * aggregation state is the problem. Space-Saving keeps a fixed
  * `capacity`-entry summary per partition (Metwally et al. 2005,
  * "Efficient computation of frequent and top-k elements in data
  * streams"), so state is O(partitions × capacity) regardless of
  * cardinality, and only candidate summaries shuffle.
  *
  * Error contract (the spec asserts it): with per-partition capacity k
  * and n total rows, every item with true count > n/k survives to the
  * merged summary, and each merged estimate is within ±n/k of truth
  * (per-partition overcount ≤ n_p/k is tracked in `err`; undercount
  * comes only from partitions that evicted the item, each losing
  * ≤ n_p/k). The reference's "unusual resource" queries run on exact
  * counts — this is their 1000×-scale drop-in.
  */
object HeavyHitters {

  /** Per-partition Space-Saving kernel. Returns every tracked item with
    * its (overestimated) count and the maximum possible overcount.
    * Eviction scans for the min-count entry (O(capacity)); at the
    * capacities that make sense here (≤ a few thousand) that beats the
    * constant factors of a linked stream-summary structure.
    */
  private[graft] def spaceSaving(it: Iterator[String], capacity: Int)
      : Iterator[(String, Long, Long)] = {
    val est = new java.util.HashMap[String, Array[Long]](capacity * 2)
    spaceSavingUpdate(est, it, capacity)
    import scala.jdk.CollectionConverters._
    est.entrySet().iterator().asScala
      .map(kv => (kv.getKey, kv.getValue()(0), kv.getValue()(1)))
  }

  /** Fold a stream of items into an EXISTING summary map (item →
    * [est, err]) — the resumable form the streaming processor feeds its
    * per-shard state through; [[spaceSaving]] is the empty-state wrapper.
    */
  private[graft] def spaceSavingUpdate(est: java.util.HashMap[String, Array[Long]],
      it: Iterator[String], capacity: Int): Unit = {
    require(capacity >= 1, "capacity must be >= 1")
    it.foreach { item =>
      val cur = est.get(item)
      if (cur != null) cur(0) += 1
      else if (est.size < capacity) est.put(item, Array(1L, 0L))
      else {
        // evict the current minimum; the newcomer inherits its count as
        // the classic Space-Saving overestimate, recorded in err
        var minKey: String = null
        var minVal = Long.MaxValue
        val e = est.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue()(0) < minVal) { minVal = kv.getValue()(0); minKey = kv.getKey }
        }
        est.remove(minKey)
        est.put(item, Array(minVal + 1, minVal))
      }
    }
  }

  /** Distributed heavy hitters over one string key column: per-partition
    * Space-Saving summaries (bounded state, no pre-shuffle), then ONE
    * tiny shuffle of ≤ partitions×capacity candidate rows merged by key.
    * `est` sums the partial estimates; `err_bound` sums the partial
    * overcounts (the per-item overcount bound — undercount is bounded
    * globally by n/capacity).
    */
  def heavyHitters(spark: SparkSession, df: DataFrame, item: Column,
      capacity: Int): DataFrame = {
    val s = spark
    import s.implicits._
    df.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[String]
      .mapPartitions(spaceSaving(_, capacity))
      .toDF("item", "est", "err")
      .groupBy(col("item"))
      .agg(sum(col("est")).as("est"), sum(col("err")).as("err_bound"))
  }

  /** Top-20 most-accessed resources, approximately: the streaming-sketch
    * twin of [[ThreatOps.qResourceAccess]]'s exact counting. capacity 256
    * per partition → estimates within n/256 (<0.4%) while the summary
    * state stays fixed no matter how many distinct resources exist.
    * rows-only oracle (estimates are data-partitioning-dependent in
    * general, deterministic here only up to the n/k bound).
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val edges = cleanEvents(spark, dir)
      .withColumn("resource", get_json_object(col("props"), "$.k"))
    heavyHitters(spark, edges, col("resource"), capacity = 256)
      .orderBy(col("est").desc, col("item").asc)
      .limit(20)
      .select(col("item").as("resource"), col("est"), col("err_bound"))
  }
}
