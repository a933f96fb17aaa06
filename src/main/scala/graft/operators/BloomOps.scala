package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — ship a fixed-size membership sketch of the
  * small side's keys to the big side's scan, so rows that cannot join are
  * dropped BEFORE the shuffle. This is the manual form of what Spark's
  * `InjectRuntimeFilter` does for eligible plans: at 100 TB the win is
  * shuffle bytes — a 1%-selective dimension filter prunes ~99% of the
  * fact-side exchange for the cost of one broadcast-sized bitmap.
  *
  * Built on Catalyst's own sketch expressions (BloomFilterAggregate /
  * BloomFilterMightContain, the codegen'd pair behind runtime row-level
  * filtering) bridged through ColumnShim — not a Scala UDF, so the probe
  * stays inside whole-stage codegen.
  */
object BloomOps {

  /** Aggregate a long key column into a serialized Bloom filter
    * (internally keyed on XxHash64, matching the probe side).
    */
  def bloomAgg(key: Column, estItems: Long, numBits: Long): Column =
    ColumnShim.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnShim.expr(key))),
        Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized Bloom filter with a long key column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnShim.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        new XxHash64(Seq(ColumnShim.expr(key)))))

  /** Semi-join `big` to `smallKeys` with a Bloom pre-filter: ONE
    * aggregation job computes the key count AND the fixed-size sketch
    * together (the binary that reaches the driver is the SKETCH —
    * `numBits/8` bytes — not the keys), the probe runs in `big`'s scan
    * stage, then the exact semi join on the survivors drops false
    * positives. Result is exactly the semi join; the bloom only moves
    * work off the shuffle.
    *
    * Saturation guard: a Bloom filter under ~8 bits/item stops pruning
    * (FP rate → 1), so if the counted keys exceed `numBits / 8` the
    * probe is SKIPPED and the plain semi join runs — paying one wasted
    * sketch build, never a per-row probe that filters nothing. Size
    * `numBits` to the expected dim-side cardinality (the default 2^23
    * bits = 1 MiB serves up to ~1M keys; Spark's own runtime filters cap
    * at 2^26 for the same reason — beyond that, ship no bloom).
    */
  def bloomSemiJoin(big: DataFrame, bigKey: Column,
      smallKeys: DataFrame, smallKey: Column,
      numBits: Long = 1L << 23): DataFrame = {
    // The sketch rides a SCALAR SUBQUERY instead of a driver .head()
    // (r17): the old shape was two sequential Spark ACTIONS per
    // execution (build-and-collect the sketch, then plan and run the
    // main query), costing an extra job submission + planning pass
    // every run — and making the operator unusable anywhere a single
    // declarative plan is required. The saturation guard moves INTO the
    // subquery: it yields NULL instead of a useless saturated filter
    // (count > numBits/8 ⇒ FP rate → 1), might_contain(NULL, k) is NULL,
    // and coalesce(…, true) turns that into "keep every row" — exactly
    // the old plain-semi-join fallback, with the per-row probe reduced
    // to a null check. This is the same plan shape Spark's own
    // InjectRuntimeFilter emits (bloom_filter_agg in a scalar subquery
    // feeding might_contain at the scan).
    val guarded = smallKeys.agg(
      when(count(smallKey) <= lit(numBits / 8),
        bloomAgg(smallKey, numBits / 8, numBits))
        .otherwise(lit(null).cast(BinaryType)).as("bf"))
    val probe = ColumnShim.column(
      BloomFilterMightContain(
        ColumnShim.expr(guarded.scalar()),
        new XxHash64(Seq(ColumnShim.expr(bigKey)))))
    big.filter(coalesce(probe, lit(true)))
      .join(smallKeys, bigKey === smallKey, "left_semi")
  }

  /** Revenue of lineitems whose order is URGENT, with the urgent-order
    * keyset pushed to the lineitem scan as a Bloom filter. Oracled
    * against the plain semi-join aggregation — the sketch must not
    * change the answer, only the plan shape.
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val li = lineitem(spark, dir)
    bloomSemiJoin(li, col("l_orderkey"), urgent, col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(RelationalOps.revDec), 2).cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))
  }
}
