package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WideRowSumSpec extends SparkSpec {

  test("graft_row_sum equals the declarative aggregate-over-array spelling") {
    import spark.implicits._
    val df = Seq((1, 2L, 3.9, 4.0f), (10, 20L, 30.1, 40.5f)).toDF("a", "b", "c", "d")
    val native = df.select(
      call_function("graft_row_sum", col("a"), col("b"), col("c"), col("d")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    // float/double truncate like CAST(x AS BIGINT)
    assert(native == Seq(1L + 2 + 3 + 4, 10L + 20 + 30 + 40))
  }

  test("nulls count as zero and the result is never null") {
    import spark.implicits._
    val df = Seq((Some(1), None: Option[Long]), (None, Some(7L)))
      .toDF("a", "b")
    val out = df.select(call_function("graft_row_sum", col("a"), col("b")).as("s"))
    assert(!out.schema("s").nullable)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 7L))
  }

  test("survives 5,000-column codegen (method splitting) and matches the sum") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val n = 5000
    // source rows via RDD, not a 5,000-expression Project: the input
    // construction must not be the thing whose codegen is under test
    val schema = StructType((0 until n).map(j => StructField(s"c$j", IntegerType)))
    val rdd = spark.sparkContext.parallelize(0 until 100, 4)
      .map(i => Row.fromSeq((0 until n).map(j => (i + j) % 7)))
    val wide = spark.createDataFrame(rdd, schema)
    val total = wide.select(
        call_function("graft_row_sum", (0 until n).map(j => col(s"c$j")): _*).as("s"))
      .agg(sum("s")).head().getLong(0)
    val expect = (0L until 100L).map(i => (0 until n).map(j => (i + j) % 7).sum).sum
    assert(total == expect)
  }

  test("rejects non-numeric columns") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(call_function("graft_row_sum", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_row_sum"))
  }
}
