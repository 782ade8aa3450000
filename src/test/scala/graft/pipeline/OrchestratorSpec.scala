package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class OrchestratorSpec extends SparkSpec {

  test("end-to-end: mixed-format dir with a corrupt file stages, merges, reports") {
    val base = Files.createTempDirectory("graft_pipe").toString
    Files.createDirectories(Paths.get(base, "json"))
    Files.createDirectories(Paths.get(base, "csv"))
    Files.createDirectories(Paths.get(base, "docx"))
    // keyed json -> CTAS now, MERGE on the re-run
    Files.writeString(Paths.get(base, "json", "products.json"),
      """[{"id": 1, "name": "one"}, {"id": 2, "name": "two"}]""")
    // corrupt single-doc json -> zero valid rows -> skipped, never aborts
    Files.writeString(Paths.get(base, "json", "broken.json"), "{definitely not json")
    // keyless csv -> CTAS now, INSERT OVERWRITE on the re-run
    Files.writeString(Paths.get(base, "csv", "notes.csv"), "a,b\n1,2\n3,4\n")
    Files.writeString(Paths.get(base, "docx", "memo.txt"), "hello\nworld\n")
    val before = org.apache.spark.sql.GraftBridge.numCachedPlans(spark)
    val cat = graft.lake.LakeCatalog(spark,
      Files.createTempDirectory("graft_pipe_lake").toString)

    val r1 = Orchestrator.run(spark, base, cat, "raw")
    assert(r1.staged == 3 && r1.merged == 3 && r1.failed == 0, r1.render)
    assert(r1.totalSourceRows == 6, r1.render)
    assert(r1.outcomes.forall(_.strategy.startsWith("CREATE TABLE")), r1.render)
    assert(cat.listTables("raw") == Seq("csv_notes", "json_products", "text_memo"))
    assert(cat.rowCount("raw", "json_products") == 2)
    assert(cat.rowCount("raw", "text_memo") == 2)
    // every parse cache pinned by the scan is released by the run
    assert(org.apache.spark.sql.GraftBridge.numCachedPlans(spark) == before,
      "orchestrator leaked parse caches")

    // re-run with updated source data: keyed table upserts, keyless overwrites
    Files.writeString(Paths.get(base, "json", "products.json"),
      """[{"id": 2, "name": "TWO"}, {"id": 3, "name": "three"}]""")
    val r2 = Orchestrator.run(spark, base, cat, "raw")
    val strat = r2.outcomes.map(o => o.table -> o.strategy).toMap
    assert(strat("json_products").startsWith("MERGE"), r2.render)
    assert(strat("csv_notes").startsWith("INSERT OVERWRITE"), r2.render)
    assert(cat.rowCount("raw", "json_products") == 3) // id=1 kept, 2 updated, 3 inserted
    assert(cat.read("raw", "json_products").filter("id = 2 AND name = 'TWO'").count() == 1)
    // the report renders a per-table console summary (reference parity)
    assert(r2.render.contains("MERGE (upsert) using key `id`"), r2.render)
  }

  test("source dir and lake root both work through scheme-qualified file:// URIs") {
    // the ingestion scan and the catalog speak the same Hadoop FS contract:
    // the whole pipeline must run when BOTH ends are URI-addressed (the
    // object-store deployment shape — s3a:// swaps in via config alone)
    val base = Files.createTempDirectory("graft_pipe_uri").toString
    Files.createDirectories(Paths.get(base, "csv"))
    Files.writeString(Paths.get(base, "csv", "t.csv"), "id,v\n1,a\n2,b\n")
    val cat = graft.lake.LakeCatalog(spark,
      "file://" + Files.createTempDirectory("graft_pipe_uri_lake").toString)
    val r = Orchestrator.run(spark, "file://" + base, cat, "raw")
    assert(r.staged == 1 && r.merged == 1 && r.failed == 0, r.render)
    assert(cat.rowCount("raw", "csv_t") == 2)
  }
}
