package graft.sources

import graft.SparkSpec

/** JDBC ingestion seam (reference main.py:18-19 ships MySQL/Mongo
  * connector jars for its OLTP feed) against the embedded Derby engine
  * this environment ships: plain read, the PARTITIONED scale path
  * (range-predicated parallel queries), remote pushdown, and the
  * per-source isolation contract.
  */
class JdbcSourceSpec extends SparkSpec {

  private def freshDb(): String = {
    val db = s"memory:graft_spec_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      conn.createStatement().execute(
        "CREATE TABLE items (id INT PRIMARY KEY, name VARCHAR(32), qty INT)")
      val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"item_$i"); ps.setInt(3, i * 10)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    s"jdbc:derby:$db"
  }

  test("plain JDBC read round-trips rows and schema") {
    val url = freshDb()
    val df = MultiFormatReader.readJdbc(spark, url, "items")
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "qty"))
    assert(df.count() == 100)
    assert(df.filter("id = 42").collect().head.getString(1) == "item_42")
  }

  test("partitioned read issues parallel range queries and loses no rows") {
    val url = freshDb()
    val df = MultiFormatReader.readJdbc(spark, url, "items",
      partitionColumn = Some("id"), lowerBound = Some(0L),
      upperBound = Some(101L), numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4,
      "the scale path must fan out to numPartitions range queries")
    // range predicates must partition, not filter: the union is exact
    assert(df.count() == 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("qty")).head().getLong(0)
      == (1 to 100).map(_ * 10L).sum)
  }

  test("filters and projections push into the remote query") {
    val url = freshDb()
    val df = MultiFormatReader.readJdbc(spark, url, "items")
      .filter("qty >= 500").select("id")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual"),
      s"qty filter must reach the remote SQL:\n$scan")
    assert(df.count() == 51)
  }

  test("a broken source is skipped under the isolation contract, never thrown") {
    val none = MultiFormatReader.ingestJdbc(spark, "bad",
      "jdbc:derby:memory:does_not_exist", "nope")
    assert(none.isEmpty)
    val some = MultiFormatReader.ingestJdbc(spark, "items", freshDb(), "items")
    assert(some.exists(t => t.rows == 100 && t.format == "JDBC" &&
      t.name == "jdbc_items"))
  }
}
