package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the soak-corpus generator's invariants — the properties the 10×
  * scale check depends on and that a drifted generator would silently
  * break: replicas multiply row counts, foreign keys stay join-consistent
  * within each replica, and documents/embeddings replicas are NEAR
  * duplicates (perturbed), never byte-identical copies that collapse the
  * dedup/ANN work to triviality.
  */
class SoakDataSpec extends SparkSpec {

  @volatile private var generated: Option[String] = None
  private lazy val dst = {
    val d = Files.createTempDirectory("graft_soak_spec_").toString
    SoakData.generate(spark, sfDir, d, mult = 2)
    generated = Some(d)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")

  override def afterAll(): Unit = {
    // the generated 2x corpus is a multi-table parquet tree; leaking it
    // into /tmp on every run adds up fast (only touch dst if a test
    // actually forced the lazy — never generate just to delete)
    try generated.foreach(d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    finally super.afterAll()
  }

  test("fact tables multiply; dims are copied once") {
    val src = Tables(spark, sfDir)
    assert(t("orders").count() == 2 * src.orders.count())
    assert(t("lineitem").count() == 2 * src.lineitem.count())
    assert(t("events").count() == 2 * src.events.count())
    assert(t("documents").count() == 2 * src.documents.count())
    assert(t("nation").count() == src.nation.count())
    assert(t("region").count() == src.region.count())
  }

  test("replica keys are disjoint and foreign keys stay join-consistent") {
    // every o_custkey resolves to a customer, every l_orderkey to an order
    // — within the SAME replica (the property the lake_cdc_apply finding
    // showed fixed-offset key synthesis can violate)
    assert(t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    assert(t("lineitem").select("l_orderkey").distinct().join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    // keys of copy 1 sit exactly one stride above copy 0
    val src = Tables(spark, sfDir)
    val srcMax = src.orders.agg(max("o_orderkey")).head().getLong(0)
    val dstMax = t("orders").agg(max("o_orderkey")).head().getLong(0)
    assert(dstMax == srcMax + SoakData.Stride)
  }

  test("document and embedding replicas are near- but not exact duplicates") {
    val src = Tables(spark, sfDir)
    val copy1Docs = t("documents").filter(col("doc_id") >= SoakData.Stride)
      .select((col("doc_id") - SoakData.Stride).as("doc_id"),
        col("text").as("text1"))
    val joined = src.documents.select("doc_id", "text").join(copy1Docs, "doc_id")
    assert(joined.filter(col("text") === col("text1")).count() == 0,
      "replica text must be perturbed (near-dup), not byte-identical")
    assert(joined.filter(col("text1").startsWith(col("text"))).count()
      == joined.count(), "replica text must extend the original (stay near)")
    // the stored-length invariant must hold on replicas too
    assert(t("documents").filter(col("n_chars") =!= length(col("text")))
      .count() == 0, "n_chars must track the perturbed text")

    val copy1Emb = t("embeddings").filter(col("vec_id") >= SoakData.Stride)
      .select((col("vec_id") - SoakData.Stride).as("vec_id"),
        col("embedding").as("e1"))
    val embJoined = src.embeddings.select("vec_id", "embedding").join(copy1Emb, "vec_id")
    assert(embJoined.filter(col("embedding") === col("e1")).count() == 0,
      "replica embeddings must be perturbed")
  }
}
