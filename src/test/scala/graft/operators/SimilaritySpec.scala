package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine: identical vectors score 1, orthogonal score 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f), "same"),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), "orth")
    ).toDF("a", "b", "kind")
    val rows = df.select(col("kind"), Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows("same") - 1.0) < 1e-12)
    assert(math.abs(rows("orth")) < 1e-12)
  }

  test("brute-force ANN: ranks are dense 1..k per query, scores descending") {
    val df = Similarity.annBruteforce.fn(spark, sfDir).cache()
    val byQuery = df.groupBy("query_id").agg(
      count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
    assert(byQuery.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    // scores non-increasing with rank within each query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rank")
    val bad = df.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() == 0)
  }

  /** dir with embeddings augmented by an exact copy of vec 0 (id 999999) */
  private lazy val augmentedDir: String = {
    val t = graft.Tables(spark, sfDir)
    val copy = t.embeddings.filter(col("vec_id") === 0)
      .select(lit(999999L).as("vec_id"), col("embedding"), lit(0).as("label"))
    val aug = t.embeddings.unionByName(copy)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann").toString
    aug.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    for (n <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$tmp/$n.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$n.parquet"))
    tmp
  }

  test("LSH ANN: identical planted vector lands in the query's bucket at rank 1") {
    val res = Similarity.annLsh.fn(spark, augmentedDir)
    val top = res.filter(col("query_id") === 0 && col("rank") === 1).collect()
    assert(top.nonEmpty, "query 0 found no bucket neighbors")
    assert(top(0).getAs[Long]("neighbor_id") == 999999L)
    assert(math.abs(top(0).getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("IVF ANN: identical planted vector is found at rank 1 via its own cell") {
    val res = Similarity.annIvf.fn(spark, augmentedDir)
    val top = res.filter(col("query_id") === 0 && col("rank") === 1).collect()
    assert(top.nonEmpty, "query 0 probed no candidates")
    assert(top(0).getAs[Long]("neighbor_id") == 999999L)
    assert(math.abs(top(0).getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("IVF ANN: achieves reasonable recall of brute-force top-5") {
    val exact = Similarity.annBruteforce.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.annIvf.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 of 16 cells probed → recall well above random cell coverage (25%)
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("IMI ANN: identical planted vector is found at rank 1 via its product cell (r15)") {
    val res = Similarity.annImiDet.fn(spark, augmentedDir)
    val top = res.filter(col("query_id") === 0 && col("rank") === 1).collect()
    assert(top.nonEmpty, "query 0 probed no candidates")
    assert(top(0).getAs[Long]("neighbor_id") == 999999L)
    assert(math.abs(top(0).getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("IMI ANN: reasonable recall of brute-force top-5; kSide scaling formula (r15)") {
    val exact = Similarity.annBruteforce.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.annImiDet.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // IMI is the >8M-vector path: at the spec corpus (~50 vectors) its 256
    // product cells hold ~0.2 vectors each, so probing 4 of them is a
    // deliberately over-partitioned regime — this floor only pins
    // NON-DEGENERACY (well above the 1.6% random cell coverage; exact
    // semantics are hash-pinned by the DuckDB oracle, and the planted-pair
    // test above pins the own-cell recall guarantee)
    assert(recall >= 0.05, s"IMI recall $recall below random-coverage floor")
    // the switch point and the per-side scaling law
    assert(!ImiIndex.needed(8L * 1000 * 1000))
    assert(ImiIndex.needed(8193L * 1000))
    assert(ImiIndex.kSideFor(500) == 16)            // clamped small
    assert(ImiIndex.kSideFor(10000000L) == 71)      // ceil(sqrt(5000))
    assert(ImiIndex.kSideFor(40000000L) == 142)     // cells keep scaling
    // candidates/query bounded at ~nProbe x target across the decade
    val c10 = 4.0 * 10000000L / (71.0 * 71)
    val c40 = 4.0 * 40000000L / (142.0 * 142)
    assert(math.abs(c40 / c10 - 1.0) < 0.1, s"$c10 vs $c40")
  }

  test("IMI codebooks persist to the lake; cold-start search matches warm search (r15)") {
    val t = graft.Tables(spark, sfDir)
    val emb = t.embeddings
    val kSide = ImiIndex.kSideFor(emb.count())
    val (a, b) = ImiIndex.codebooksDet(emb, "vec_id", "embedding", kSide)
    val root = java.nio.file.Files.createTempDirectory("graft_imi_").toString
    val cat = graft.lake.LakeCatalog(spark, root)
    ImiIndex.buildIndex(cat, "ann", "imi_codebooks", emb, "vec_id", "embedding", kSide)
    val (a2, b2) = ImiIndex.loadCodebooks(cat, "ann", "imi_codebooks")
    // the round-trip is bit-exact (floats through parquet)
    assert(a2.size == a.size && b2.size == b.size)
    assert(a.zip(a2).forall { case ((c1, v1), (c2, v2)) =>
      c1 == c2 && java.util.Arrays.equals(v1, v2) })
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val warm = ImiIndex.searchTopK(emb, "vec_id", "embedding", a, b, queries, 5)
      .collect().map(_.toString).toSeq
    val cold = ImiIndex.searchTopK(emb, "vec_id", "embedding", a2, b2, queries, 5)
      .collect().map(_.toString).toSeq
    assert(warm == cold, "cold-start search must match the warm search exactly")
  }

  test("IVF centroids persist to the lake; cold-start search matches warm search") {
    val emb = graft.Tables(spark, sfDir).embeddings
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_ivf").toString)
    // train once, store the model as an ordinary versioned lake table
    IvfIndex.buildIndex(cat, "models", "ivf_centroids", emb, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val warm = IvfIndex.searchTopK(emb, "vec_id", "embedding",
      IvfIndex.trainCentroids(emb, "vec_id", "embedding"), queries, k = 5)
    // cold start: no retraining — centroids read back from the lake
    val cold = IvfIndex.searchTopK(emb, "vec_id", "embedding",
      IvfIndex.loadCentroids(cat, "models", "ivf_centroids"), queries, k = 5)
    assert(cold.collect().toSeq == warm.collect().toSeq,
      "cold-start (stored centroids) must reproduce the warm search exactly")
    assert(cat.versions("models", "ivf_centroids") == Seq(1))
  }

  test("registered ann_ivf amortizes: second invocation runs ZERO KMeans fits, same rows") {
    // the driver-checked query itself must follow the persisted-model
    // economics: build-if-absent into the lake, cold-start after that
    val first = Similarity.annIvf.fn(spark, sfDir).collect().toSeq
    val fitsAfterFirst = IvfIndex.kmeansFits.get()
    val second = Similarity.annIvf.fn(spark, sfDir).collect().toSeq
    assert(IvfIndex.kmeansFits.get() == fitsAfterFirst,
      "repeat ann_ivf invocation must not re-fit the quantizer")
    assert(second == first,
      "cold-start rows must match the invocation that built the index")
    // the persisted index must live under a USER-SCOPED scratch root (or
    // an explicit GRAFT_SCRATCH): a world-shared deterministic tmpdir
    // path lets another local user squat the dir or plant stale centroids
    val user = sys.props("user.name").replaceAll("[^A-Za-z0-9._-]", "_")
    val expectedBase = sys.env.get("GRAFT_SCRATCH")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft_scratch_$user"))
      .resolve("ivf")
    assert(java.nio.file.Files.isDirectory(expectedBase),
      s"IVF scratch must be rooted at the user-scoped $expectedBase")
  }

  test("registered ann_imi_det amortizes: second invocation runs ZERO codebook fits, same rows (r16)") {
    // the IMI entry must follow the same persisted-model economics as
    // ann_ivf: build-if-absent into the lake, cold-start after that
    val first = Similarity.annImiDet.fn(spark, sfDir).collect().toSeq
    val fitsAfterFirst = ImiIndex.codebookFits.get()
    val second = Similarity.annImiDet.fn(spark, sfDir).collect().toSeq
    assert(ImiIndex.codebookFits.get() == fitsAfterFirst,
      "repeat ann_imi_det invocation must not re-fit the codebooks")
    assert(second == first,
      "cold-start rows must match the invocation that built the index")
  }

  test("cell-at-ingest: stored-cell search matches inline assignment; appends assign only the delta (r16)") {
    val emb = graft.Tables(spark, sfDir).embeddings
    val kSide = 8
    val (a, b) = ImiIndex.codebooksDet(emb, "vec_id", "embedding", kSide)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // IMI: a corpus carrying its stored product cell ranks identically
    val pre = ImiIndex.assign(emb, "embedding", a, b)
    val viaStored = ImiIndex.searchTopK(pre, "vec_id", "embedding", a, b,
      queries, 5, cellCol = Some("cell")).collect().toSeq
    val inline = ImiIndex.searchTopK(emb, "vec_id", "embedding", a, b,
      queries, 5).collect().toSeq
    assert(viaStored == inline, "stored-cell IMI search must match inline")
    // IVF: same contract
    val cents = IvfIndex.trainCentroids(emb, "vec_id", "embedding", 8)
    val preIvf = IvfIndex.assign(emb, "embedding", cents)
    val viaStoredIvf = IvfIndex.searchTopK(preIvf, "vec_id", "embedding",
      cents, queries, 5, cellCol = Some("cell")).collect().toSeq
    val inlineIvf = IvfIndex.searchTopK(emb, "vec_id", "embedding",
      cents, queries, 5).collect().toSeq
    assert(viaStoredIvf == inlineIvf, "stored-cell IVF search must match inline")
    // incremental ingest-time assignment: the E22→assign→sink pipeline
    // materializes the twin table, and an appended commit re-runs from
    // the same checkpoint assigning ONLY the delta (exactly-once rows)
    val root = java.nio.file.Files.createTempDirectory("graft_cellingest_")
    val cat = graft.lake.LakeCatalog(spark, root.resolve("lake").toString)
    cat.write("ann", "c", emb.filter(col("vec_id") % 2 === 0))
    val cp = root.resolve("cp").toString
    def pass(): Unit = {
      val q = ImiIndex.assignIncremental(
        spark, cat, "ann", "c", "c_cells", "embedding", a, b, cp)
      try q.processAllAvailable() finally q.stop()
    }
    pass()
    val half = cat.rowCount("ann", "c_cells")
    assert(half == emb.filter(col("vec_id") % 2 === 0).count())
    cat.write("ann", "c", emb.filter(col("vec_id") % 2 =!= 0),
      org.apache.spark.sql.SaveMode.Append)
    pass()
    assert(cat.rowCount("ann", "c_cells") == emb.count(),
      "append increment must add exactly the delta")
    // the stored cells agree with a batch assignment of the same rows
    val stored = cat.read("ann", "c_cells").select("vec_id", "cell")
    val batch = ImiIndex.assign(emb, "embedding", a, b).select("vec_id", "cell")
    assert(stored.exceptAll(batch).isEmpty && batch.exceptAll(stored).isEmpty,
      "ingest-time cells must equal batch-assigned cells")
  }

  test("scalar quantization: per-element error within half a level; top-1 mostly preserved") {
    val emb = graft.Tables(spark, sfDir).embeddings
    val joined = Similarity.quantizeRecon(emb, "vec_id", "embedding", "vec_id")
      .join(emb, "vec_id")
    // |recon - x| <= (mx - mn) / 255 / 2 + eps per dimension, by construction
    val bounds = Similarity.quantBounds(emb, "embedding").head()
    val mns = bounds.getSeq[Double](0); val mxs = bounds.getSeq[Double](1)
    val rows = joined.select("embedding", "recon").collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0); val rec = r.getSeq[Double](1)
      orig.indices.foreach { i =>
        val halfLevel = (mxs(i) - mns(i)) / 255.0 / 2.0
        assert(math.abs(rec(i) - orig(i)) <= halfLevel * (1 + 1e-9),
          s"dim $i: |${rec(i)} - ${orig(i)}| > $halfLevel")
      }
    }
    // quantized search should agree with exact search on most top-1s
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter(col("rank") === 1).select("query_id", "neighbor_id").collect()
        .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val exact = top1(Similarity.annBruteforce.fn(spark, sfDir))
    val quant = top1(Similarity.annQuantized.fn(spark, sfDir))
    val agree = exact.count { case (q, n) => quant.get(q).contains(n) }
    assert(agree >= exact.size / 2,
      s"quantized top-1 agrees on only $agree/${exact.size} queries")
  }

  test("PQ: codebook members reconstruct exactly; others from codewords; cross-engine row pinned") {
    val emb = graft.Tables(spark, sfDir).embeddings
    val (cbDf, m) = Similarity.pqCodebook(emb, "vec_id", "embedding")
    val cb = cbDf.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toVector))
    val codewords: Map[Int, Set[Vector[Float]]] =
      cb.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val cbIds = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(Similarity.PqCodebookSize).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val recon = Similarity.pqRecon(emb, "vec_id", "embedding", "vec_id")
      .join(emb, "vec_id").select("vec_id", "recon", "embedding").collect()
    recon.foreach { r =>
      val id = r.getLong(0)
      val rec = r.getSeq[Float](1); val orig = r.getSeq[Float](2)
      assert(rec.length == orig.length)
      // every reconstructed subvector is a real codeword of its subspace
      for (s <- 0 until m) {
        val sub = rec.slice(s * Similarity.PqSubDim, (s + 1) * Similarity.PqSubDim).toVector
        assert(codewords(s).contains(sub), s"vec $id sub $s not a codeword")
      }
      // a vector IN the codebook sample reconstructs to itself (distance-0
      // codewords win, ties broken deterministically to an equal-value one)
      if (cbIds.contains(id))
        assert(rec == orig, s"codebook member $id must reconstruct exactly")
    }
    // cross-engine pin: rank-1 row of query 0 equals DuckDB's (the full
    // 50-row hash equality is the driver's job; this catches codebook or
    // tie-break drift locally)
    val first = Similarity.annPq.fn(spark, sfDir)
      .filter(col("query_id") === 0 && col("rank") === 1).head()
    assert(first.getLong(2) == 12L, s"rank-1 neighbor drifted: ${first.getLong(2)}")
    assert(first.getDouble(3) == 0.42775442385451073,
      s"rank-1 score drifted: ${first.getDouble(3)}")
  }

  test("cosine accepts double arrays and matches the HOF formulation bit-exactly") {
    import spark.implicits._
    val df = Seq((Array(0.6, 0.8, 0.1), Array(0.3, 0.9, 0.7)))
      .toDF("a", "b") // array<double> columns
    val row = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof"),
      // mixed widths: double vs float side
      Similarity.cosine(col("a"), col("b").cast("array<float>")).as("mixed")).head()
    assert(row.getDouble(0) == row.getDouble(1), "native vs HOF must be bit-identical")
    assert(math.abs(row.getDouble(2) - row.getDouble(0)) < 1e-6)
    // float arrays: unchanged bit-exact path
    val f = df.select(
      Similarity.cosine(col("a").cast("array<float>"), col("b").cast("array<float>")).as("n"),
      Similarity.cosineHof(col("a").cast("array<float>"), col("b").cast("array<float>")).as("h"))
      .head()
    assert(f.getDouble(0) == f.getDouble(1))
  }

  test("PqReconstruct expression: lowest-id tie-break, degenerate inputs, double widening") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    // two IDENTICAL codewords (cid 0 and 1) + a far one: equidistant snap
    // must pick cid 0's bytes (same values as cid 1, so assert via a third
    // distinct-but-equidistant pair instead: +1 and -1 around the vector)
    val samples = Array(
      Array(1.0f, 1.0f), // cid 0: d = (0-1)^2*2 = 2 from origin
      Array(-1.0f, -1.0f), // cid 1: d = 2 from origin — exact tie
      Array(9.0f, 9.0f)) // cid 2: far
    def recon(c: org.apache.spark.sql.Column) = GraftBridge.column(
      graft.functions.PqReconstruct(GraftBridge.expression(spark, c), samples, 2))
    val out = Seq(Seq(0.0f, 0.0f)).toDF("v").select(recon(col("v"))).head().getSeq[Float](0)
    assert(out == Seq(1.0f, 1.0f), s"tie must break to lowest code id, got $out")
    // dim mismatch and null vector → null
    val degenerate = Seq((Some(Seq(0.1f, 0.2f, 0.3f)), Option.empty[Seq[Float]]))
      .toDF("bad_dim", "null_vec")
      .select(recon(col("bad_dim")).as("a"), recon(col("null_vec")).as("b")).head()
    assert(degenerate.isNullAt(0) && degenerate.isNullAt(1))
    // array<double> input widens per-element exactly like the float path
    val d = Seq(Seq(0.9, 0.9)).toDF("v").select(recon(col("v"))).head().getSeq[Float](0)
    assert(d == Seq(1.0f, 1.0f))
  }

  test("JL signs: deterministic, exactly ±1, and not degenerate per output dim") {
    val a = Similarity.jlSigns(Similarity.JlDims, 64)
    val b = Similarity.jlSigns(Similarity.JlDims, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    // a constant-sign row would project onto the all-ones axis — md5 bits
    // keep every row mixed (both signs present)
    assert(a.forall(row => row.contains(1.0) && row.contains(-1.0)))
    // rows are distinct directions (distinct sign patterns)
    assert(a.map(_.toSeq).distinct.length == Similarity.JlDims)
  }

  test("JL sketch column equals a driver-side fold of the same signs, bit-exactly") {
    val t = graft.Tables(spark, sfDir)
    val signs = Similarity.jlSigns(Similarity.JlDims, 64)
    val got = t.embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"),
        Similarity.jlSketch(col("embedding"), signs).as("sketch"))
      .collect()
    got.foreach { r =>
      val emb = r.getSeq[Float](1)
      val sk = r.getSeq[Double](2)
      val want = signs.map(row =>
        emb.indices.foldLeft(0.0)((acc, i) => acc + row(i) * emb(i).toDouble))
      assert(sk == want.toSeq, s"vec ${r.getLong(0)}")
    }
  }

  test("JL prefilter: dense ranks, and real recall of the brute-force top-5") {
    val jl = Similarity.annJlSketch.fn(spark, sfDir).cache()
    val byQuery = jl.groupBy("query_id").agg(
      count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
    assert(byQuery.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    val bf = Similarity.annBruteforce.fn(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    val hits = jl.select("query_id", "neighbor_id").intersect(bf).count()
    val total = bf.count()
    // 32-dim ±1 sketches over 64-dim embeddings: the prefilter must retain
    // a solid majority of the true top-5 (observed 0.70 on the testdata —
    // near-orthogonal random vectors are JL's hardest case; the floor is
    // deliberately below that so data regeneration doesn't flake the suite
    // while a broken projection — recall ≈ top-5/corpus — still fails
    // loudly)
    assert(hits.toDouble / total >= 0.5, s"recall $hits/$total")
  }
}
