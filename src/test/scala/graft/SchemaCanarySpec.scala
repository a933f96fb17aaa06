package graft

import org.apache.spark.sql.types._

/** Schema-drift canary: reads every driver-generated table and asserts the
  * logical type of every column, failing with a message that NAMES the
  * drifted column and both types. The driver regenerates the testdata
  * between rounds and has already changed a physical type once
  * (events.ts: TIMESTAMP(NANOS) → timestamp[us]) — that drift silently
  * broke 90 queries at ANALYSIS time with an error that named no file.
  * This spec turns the next drift into a one-line diagnosis.
  *
  * events.ts accepts the three physical encodings [[Tables.adaptEventTs]]
  * is built to normalize (int64-nanos under the legacy conf, TIMESTAMP_NTZ,
  * TIMESTAMP): any of them is fine BY CONSTRUCTION; a fourth encoding —
  * or drift on any other column — should fail here, not in operator 47.
  */
class SchemaCanarySpec extends SparkSpec {

  private def expect(table: String, cols: (String, Seq[DataType])*): Unit = {
    val df =
      if (table == "events") Tables.table(spark, sf, "events") // raw: pre-adapt types
      else Tables.table(spark, sf, table)
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val expectedNames = cols.map(_._1).toSet
    val missing = expectedNames -- actual.keySet
    assert(missing.isEmpty, s"$table: missing column(s) ${missing.mkString(", ")} " +
      s"(present: ${actual.keys.toSeq.sorted.mkString(", ")})")
    val extra = actual.keySet -- expectedNames
    assert(extra.isEmpty, s"$table: unexpected new column(s) ${extra.mkString(", ")}")
    for ((name, oks) <- cols) {
      val got = actual(name)
      assert(oks.contains(got),
        s"SCHEMA DRIFT in $table.$name: got $got, expected one of " +
          s"${oks.mkString(" | ")} — the driver regenerated the parquet with " +
          "a new physical type; extend the reader dispatch (see Tables.adaptEventTs)")
    }
  }

  private val ts = Seq[DataType](TimestampType, TimestampNTZType)

  test("events schema (ts may be nanos-long / NTZ / timestamp — all adapted)") {
    // Same conf Tables.events sets, so a NANOS file surfaces as LongType
    // here instead of failing the raw read outright.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expect("events",
      "event_id" -> Seq(LongType),
      "ts" -> (LongType +: ts),
      "user_id" -> Seq(LongType),
      "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType),
      "props" -> Seq(StringType))
    // And the adapted frame must always land on session-tz TIMESTAMP.
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType,
      "Tables.events must normalize ts to TIMESTAMP whatever the file carries")
  }

  test("lineitem schema") {
    expect("lineitem",
      "l_orderkey" -> Seq(LongType), "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType), "l_linenumber" -> Seq(IntegerType, LongType),
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType), "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> ts)
  }

  test("orders schema") {
    expect("orders",
      "o_orderkey" -> Seq(LongType), "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType), "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Seq(StringType))
  }

  test("customer/supplier/part/nation/region schemas") {
    expect("customer",
      "c_custkey" -> Seq(LongType), "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(LongType, IntegerType), "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType))
    expect("supplier",
      "s_suppkey" -> Seq(LongType), "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(LongType, IntegerType), "s_acctbal" -> Seq(DoubleType))
    expect("part",
      "p_partkey" -> Seq(LongType), "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType), "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType, LongType), "p_retailprice" -> Seq(DoubleType))
    expect("nation",
      "n_nationkey" -> Seq(LongType, IntegerType), "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(LongType, IntegerType))
    expect("region",
      "r_regionkey" -> Seq(LongType, IntegerType), "r_name" -> Seq(StringType))
  }

  test("documents/embeddings schemas") {
    expect("documents",
      "doc_id" -> Seq(LongType), "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType))
    expect("embeddings",
      "vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Seq(IntegerType, LongType))
  }
}
