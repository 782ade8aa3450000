package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("minhash LSH finds the planted near-duplicates") {
    val pairs = Dedup.dedupMinhash.fn(spark, sfDir).cache()
    val t = graft.Tables(spark, sfDir)
    val nPlanted = t.documents.filter(col("doc_id") % 7 === 0).count()
    // every planted pair (id, id+1M) should surface with high est jaccard
    val found = pairs.filter(col("b") - 1000000L === col("a")).count()
    assert(found >= (nPlanted * 0.9).toLong, s"LSH recall too low: $found/$nPlanted")
    // and high estimated jaccard on those pairs
    val low = pairs.filter(col("b") - 1000000L === col("a") && col("est_jaccard") < 0.6).count()
    assert(low == 0)
  }

  test("exact n-gram jaccard confirms planted pairs near 1.0") {
    val pairs = Dedup.dedupNgramJaccard.fn(spark, sfDir)
    val self = pairs.filter(col("b") - 1000000L === col("a"))
    assert(self.count() > 0)
    assert(self.filter(col("jaccard") < 0.7).count() == 0)
  }

  test("simhash hamming-band finds planted near-duplicates") {
    val pairs = Dedup.dedupSimhash.fn(spark, sfDir)
    val t = graft.Tables(spark, sfDir)
    val nPlanted = t.documents.filter(col("doc_id") % 7 === 0).count()
    val found = pairs.filter(col("b") - 1000000L === col("a")).count()
    // one appended token on ~50-550 char docs rarely flips >3 simhash bits
    assert(found >= (nPlanted * 0.8).toLong, s"simhash recall too low: $found/$nPlanted")
  }

  test("embedding near-dup finds planted identical vectors with cosine ~1") {
    val pairs = Dedup.dedupEmbedding.fn(spark, sfDir)
    val t = graft.Tables(spark, sfDir)
    val nPlanted = t.embeddings.filter(col("vec_id") % 20 === 0).count()
    val self = pairs.filter(col("b") - 1000000L === col("a"))
    assert(self.count() == nPlanted, s"expected all $nPlanted identical pairs")
    assert(self.filter(col("cosine") < 0.999).count() == 0)
  }

  test("connected components collapse transitive chains into one cluster") {
    import spark.implicits._
    // chain 1-2-3-4 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L))
    assert(Seq(10L, 11L).forall(clusters(_) == 10L))
    // the distributed pointer-jumping loop (forced via localThreshold=0)
    // must produce the identical labeling as the union-find fast path
    val distributed = Dedup.duplicateClusters(pairs, localThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == clusters, s"paths disagree: $distributed vs $clusters")
  }

  test("dedup_clusters assigns each planted mutant to its source's cluster") {
    val clusters = Dedup.dedupClusters.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = clusters.keys.filter(_ >= 1000000L)
    assert(planted.nonEmpty)
    for (p <- planted if clusters.contains(p - 1000000L)) {
      assert(clusters(p) == clusters(p - 1000000L), s"mutant $p split from source")
    }
  }

  test("survivors: one canonical member per cluster, everything else kept") {
    val survivors = Dedup.dedupSurvivors.fn(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val clusters = Dedup.dedupClusters.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = Dedup.withPlantedDups(graft.Tables(spark, sfDir).documents).count()
    // survivors = total - (clustered members that are not their own label)
    val dropped = clusters.count { case (id, label) => id != label }
    assert(survivors.size == total - dropped)
    // every cluster label survives; no non-canonical member survives
    for ((id, label) <- clusters) {
      assert(survivors.contains(label), s"canonical $label missing")
      if (id != label) assert(!survivors.contains(id), s"dup $id kept")
    }
  }

  test("exact dedup counts: no duplicate texts in base corpus") {
    val agg = Dedup.dedupExact.fn(spark, sfDir)
    assert(agg.filter(col("n_docs") =!= col("n_unique")).count() == 0)
  }

  test("estimated jaccard tracks exact jaccard on planted pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again extra"),
      (3L, "completely different content with no overlap whatsoever here now")
    ).toDF("doc_id", "text")
    val sig = docs.select(col("doc_id"),
      Dedup.shingleHashes(col("text")).as("h"))
      .withColumn("sig", Dedup.minhashSignature(col("h")))
    val a = sig.filter(col("doc_id") === 1).select(col("h").as("ha"), col("sig").as("sa"))
    val b = sig.filter(col("doc_id") === 2).select(col("h").as("hb"), col("sig").as("sb"))
    val c = sig.filter(col("doc_id") === 3).select(col("h").as("hc"), col("sig").as("sc"))
    val row = a.crossJoin(b).crossJoin(c).select(
      Dedup.exactJaccard(col("ha"), col("hb")).as("j_ab"),
      Dedup.estJaccard(col("sa"), col("sb")).as("e_ab"),
      Dedup.exactJaccard(col("ha"), col("hc")).as("j_ac"),
      Dedup.estJaccard(col("sa"), col("sc")).as("e_ac")).collect()(0)
    assert(row.getDouble(0) > 0.7)                       // near-dup truly similar
    assert(math.abs(row.getDouble(1) - row.getDouble(0)) < 0.25) // estimate tracks
    assert(row.getDouble(2) == 0.0 && row.getDouble(3) < 0.2)    // disjoint stays low
  }

  test("duplicateClusters preserves id types; string ids skip the primitive local path") {
    import spark.implicits._
    val intPairs = Seq((1, 2), (2, 3), (10, 11)).toDF("a", "b")
    val c1 = Dedup.duplicateClusters(intPairs)
    assert(c1.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(c1.schema("cluster_id").dataType == org.apache.spark.sql.types.IntegerType)
    val m1 = c1.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(m1 == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
    // string ids would null out under a long cast: must fall through to the
    // distributed loop and still produce the min-label clustering
    val sPairs = Seq(("x", "y"), ("y", "z")).toDF("a", "b")
    val m2 = Dedup.duplicateClusters(sPairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m2 == Map("x" -> "x", "y" -> "x", "z" -> "x"))
  }

  test("candidatePairs caps a degenerate mega-bucket with bounded agg state") {
    // 100k ids colliding into ONE (band, bh) bucket — the all-identical-spam
    // shape. The capped aggregate must (a) complete, (b) produce pairs only
    // among the MaxBucket smallest ids, (c) run as the k-bounded native
    // aggregate, partial-aggregated before the shuffle (so no reducer ever
    // sees the full bucket).
    val n = 100000
    val docs = spark.range(n.toLong).select(col("id"),
      array(struct(lit(0).as("band"), lit(42L).as("bh"))).as("bands"))
    val pairs = Dedup.candidatePairs(docs)
    val k = Dedup.MaxBucket
    assert(pairs.count() == k.toLong * (k - 1) / 2)
    val mx = pairs.agg(max("a").as("ma"), max("b").as("mb")).head()
    assert(mx.getLong(0) == k - 2 && mx.getLong(1) == k - 1,
      s"pairs must come from the $k smallest ids, got $mx")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("graft_min_k"), plan)
    assert(plan.contains("partial_graft_min_k"), "no map-side partial aggregation:\n" + plan)
  }

  test("candidatePairs non-long ids take the windowed capped path, same semantics") {
    // string ids: same min-k-by-id capping, exercised through the
    // row_number fallback (no native long aggregate available)
    import spark.implicits._
    val docs = (0 until 100).map(i => f"doc_$i%03d").toDF("id")
      .select(col("id"), array(struct(lit(0).as("band"), lit(7L).as("bh"))).as("bands"))
    val pairs = Dedup.candidatePairs(docs)
    val k = Dedup.MaxBucket
    assert(pairs.count() == k.toLong * (k - 1) / 2)
    // lexicographic min-k: doc_000 .. doc_063 only
    assert(pairs.agg(max("b")).head().getString(0) == f"doc_${k - 1}%03d")
    assert(pairs.schema("a").dataType == org.apache.spark.sql.types.StringType)
  }

  test("semantic dedup eliminates every planted copy with its source as witness") {
    val out = Dedup.dedupSemantic.fn(spark, sfDir).cache()
    val t = graft.Tables(spark, sfDir)
    val nPlanted = t.embeddings.filter(col("vec_id") % 20 === 0).count()
    // identical vectors assign to the same cluster deterministically, so
    // every planted copy (id+1M) must be eliminated by some lower id; its
    // witness is its source unless an even-lower near-dup exists
    val planted = out.filter(col("vec_id") >= 1000000L)
    assert(planted.count() == nPlanted,
      s"expected all $nPlanted planted copies eliminated, got ${planted.count()}")
    val withSource = planted.filter(col("dup_of") <= col("vec_id") - 1000000L).count()
    assert(withSource == nPlanted, "witness must be at or below the planted source id")
    assert(out.filter(col("cluster") < 0 || col("cluster") >= Dedup.SemClusters).count() == 0)
  }

  test("semantic dedup assignment is invariant under input partitioning") {
    val base = graft.Tables(spark, sfDir).embeddings.limit(200)
    val cents = Dedup.semCentroids(base, "vec_id", "embedding", 8)
    def assign(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      org.apache.spark.sql.GraftBridge.column(graft.functions.NearestCentroid(
        org.apache.spark.sql.GraftBridge.expression(spark, col("embedding")),
        cents)).as("cluster"))
    val one = assign(base).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val other = assign(base.repartition(13)).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one == other, "cluster assignment must not depend on partitioning")
    assert(one.values.toSet.subsetOf((0 until 8).toSet))
  }
}
