package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** AvroReader type-system pins: the container round-trip must preserve
  * values across every mapped type (incl. nested struct/array/map, date /
  * timestamp-micros / decimal logical types, nullable unions), the read
  * must convert records before the input format reuses them, and
  * unsupported shapes must fail loudly rather than stringify.
  */
class AvroReaderSpec extends SparkSpec {

  test("full-type round-trip: primitives, date/timestamp/decimal, nested, nullable") {
    val dir = Files.createTempDirectory("graft_avro").toString + "/t"
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType),
      StructField("small", IntegerType),
      StructField("ratio", DoubleType),
      StructField("name", StringType),
      StructField("blob", BinaryType),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("money", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType)),
      StructField("props", MapType(StringType, LongType)),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, true, 7, 1.5, "alpha", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-03-09"),
        java.sql.Timestamp.valueOf("2024-03-09 12:34:56.123456"),
        new java.math.BigDecimal("12345.67"),
        Seq("x", "y"), Map("k" -> 9L), Row(5, "in")),
      // null in every nullable position
      Row(2L, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroReader.writeAvro(spark, df, dir)
    val back = AvroReader.readAvro(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    assert(got.length == 2)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getBoolean(1) && r.getInt(2) == 7)
    assert(r.getString(4) == "alpha")
    assert(r.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    assert(r.getAs[java.sql.Date]("d").toString == "2024-03-09")
    assert(r.getAs[java.sql.Timestamp]("ts").toString == "2024-03-09 12:34:56.123456")
    assert(r.getAs[java.math.BigDecimal]("money").compareTo(
      new java.math.BigDecimal("12345.67")) == 0)
    assert(r.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("x", "y"))
    assert(r.getAs[Map[String, Long]]("props") == Map("k" -> 9L))
    assert(r.getAs[Row]("inner") == Row(5, "in"))
    val n = got(1)
    (1 until schema.length).foreach(i => assert(n.isNullAt(i), s"field $i"))
  }

  test("many rows across partitions survive record reuse (values distinct, not last-wins)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro2").toString + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "name")
    AvroReader.writeAvro(spark, df, dir)
    val back = AvroReader.readAvro(spark, dir)
    // a conversion AFTER buffer-ahead would collapse rows to the reused
    // record's final value; distinct counts catch that wholesale
    assert(back.count() == 10000)
    assert(back.select("name").distinct().count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (1 to 10000).map(_.toLong).sum)
  }

  test("multi-branch unions are rejected loudly, not stringified") {
    val union = org.apache.avro.SchemaBuilder.unionOf()
      .intType().and().stringType().endUnion()
    val rec = org.apache.avro.SchemaBuilder.record("r").fields()
      .name("u").`type`(union).noDefault().endRecord()
    val e = intercept[IllegalArgumentException] { AvroReader.toSparkType(rec) }
    assert(e.getMessage.contains("union"))
  }

  test("enums and fixed decode to string/binary") {
    // hand-write a container with enum + fixed through avro-core directly
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        {"name":"e","type":{"type":"enum","name":"col","symbols":["RED","BLUE"]}},
        {"name":"f","type":{"type":"fixed","name":"fx","size":2}}]}""")
    val dir = Files.createTempDirectory("graft_avro3")
    val f = dir.resolve("x.avro").toFile
    val writer = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](avroSchema))
    writer.create(avroSchema, f)
    val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
    rec.put("e", new org.apache.avro.generic.GenericData.EnumSymbol(
      avroSchema.getField("e").schema(), "BLUE"))
    rec.put("f", new org.apache.avro.generic.GenericData.Fixed(
      avroSchema.getField("f").schema(), Array[Byte](9, 8)))
    writer.append(rec); writer.close()
    val back = AvroReader.readAvro(spark, dir.toString)
    val r = back.head()
    assert(r.getString(0) == "BLUE")
    assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](9, 8))
  }
}
