package graft

import org.apache.spark.sql.types._

/** Regression gate on the driver-generated testdata contract.
  *
  * The driver regenerates /root/testdata between rounds, and an encoding
  * change there (round 8: events.ts flipped from nanos-as-int64 to parquet
  * timestamp[us]) broke ten queries spread over four files. This spec pins
  * the LOADED schema of every table — i.e. what operators actually see
  * after Tables' canonicalization — so the next silent regeneration fails
  * in one obvious place with a one-line message instead of ten analysis
  * errors.
  */
class TestdataContractSpec extends SparkSpec {

  private def expect(table: String, df: org.apache.spark.sql.DataFrame,
      wanted: (String, DataType)*): Unit = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    for ((c, t) <- wanted) {
      assert(actual.contains(c),
        s"testdata drift: $table.$c is missing (have: ${actual.keys.toSeq.sorted.mkString(", ")})")
      assert(actual(c) == t, s"testdata drift: $table.$c is ${actual(c)}, operators assume $t")
    }
  }

  test("every driver table loads with the column types the operators assume") {
    val t = Tables(spark, sfDir)

    // the canonicalized contract: ts is ALWAYS a native TimestampType here,
    // whatever encoding the parquet file ships (Tables.events converts)
    expect("events", t.events,
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)

    expect("lineitem", t.lineitem,
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType)

    expect("orders", t.orders,
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)

    expect("customer", t.customer,
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)

    expect("supplier", t.supplier,
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)

    expect("part", t.part,
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)

    expect("nation", t.nation,
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)

    expect("region", t.region,
      "r_regionkey" -> IntegerType, "r_name" -> StringType)

    expect("documents", t.documents,
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)

    val emb = t.embeddings.schema.fields.map(f => f.name -> f.dataType).toMap
    expect("embeddings", t.embeddings, "vec_id" -> LongType, "label" -> IntegerType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true) ||
      emb("embedding") == ArrayType(FloatType, containsNull = false),
      s"testdata drift: embeddings.embedding is ${emb("embedding")}, operators assume array<float>")
  }

  test("events raw file encoding is one Tables.events knows how to canonicalize") {
    // reads the parquet WITHOUT the accessor: if the driver ships a third
    // encoding, this names it before ten operators hit analysis errors
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(Seq(LongType, TimestampType, TimestampNTZType).contains(raw),
      s"testdata drift: events.ts ships as $raw — teach Tables.events this encoding")
  }
}
