package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal DataSourceV2 standing in for the MongoDB connector: same
  * option contract, three fixed documents, records the options it was
  * handed so the spec can assert the seam passes them through verbatim.
  */
object StubMongoSource {
  val schema: StructType = StructType(Seq(
    StructField("_id", LongType), StructField("name", StringType)))
  @volatile var lastOptions: Map[String, String] = Map.empty
}

class StubMongoSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StubMongoSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = new StubMongoTable
}

class StubMongoTable extends Table with SupportsRead {
  override def name(): String = "stub_mongo"
  override def schema(): StructType = StubMongoSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    import scala.jdk.CollectionConverters._
    StubMongoSource.lastOptions = options.asScala.toMap
    new StubMongoScan
  }
}

class StubMongoScan extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = StubMongoSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(new StubMongoPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new StubMongoReaderFactory
}

class StubMongoPartition extends InputPartition

class StubMongoReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < 3 }
      override def get(): InternalRow =
        InternalRow(i.toLong, UTF8String.fromString(s"doc$i"))
      override def close(): Unit = ()
    }
}

class MongoSeamSpec extends SparkSpec {

  private val stubFmt = classOf[StubMongoSource].getName

  test("readMongo passes the connector option contract through verbatim") {
    val df = MultiFormatReader.readMongo(spark, "mongodb://h:27017", "lake",
      "events", Map("aggregation.pipeline" -> "[{\"$match\":{}}]"), stubFmt)
    assert(df.count() == 3)
    val opts = StubMongoSource.lastOptions
    assert(opts("connection.uri") == "mongodb://h:27017")
    assert(opts("database") == "lake")
    assert(opts("collection") == "events")
    assert(opts("aggregation.pipeline").startsWith("[{"))
  }

  test("ingestMongo stages the source under the sanitized-name contract") {
    val t = MultiFormatReader.ingestMongo(spark, "Orders Feed", "mongodb://h",
      "lake", "orders", format = stubFmt)
    assert(t.isDefined)
    assert(t.get.name == "mongo_Orders_Feed")
    assert(t.get.format == "MONGO")
    assert(t.get.rows == 3 && t.get.cols == 2)
  }

  test("ingestMongo without a connector on the classpath skips, never throws") {
    // this environment ships no mongo-spark-connector: format resolution
    // fails and the isolation contract converts it to a skipped source
    val t = MultiFormatReader.ingestMongo(spark, "prod", "mongodb://h",
      "lake", "orders")
    assert(t.isEmpty)
  }
}
