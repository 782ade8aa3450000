package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Plan-quality regression guards: these pin the physical-plan properties
  * the 100 TB design depends on (SURVEY §4), so a refactor that silently
  * breaks pushdown or broadcasting fails CI, not the cluster.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(q: Q): String =
    q.fn(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan(Relational.q1PricingSummary)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1: aggregation is partial before the exchange") {
    val p = plan(Relational.q1PricingSummary)
    assert(p.contains("partial_sum"), p)
  }

  // supplier/part/customer carry NO broadcast() hint (they grow with SF —
  // a forced hint OOMs at 100 TB). These tests pin that the PLANNER still
  // chooses broadcast at small SF via autoBroadcastJoinThreshold, so the
  // hints stay gone without a perf cliff at test scale.
  test("q5: dimension joins broadcast via threshold, not hints (fact never shuffled)") {
    val p = plan(Relational.q5LocalSupplier)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk_parts: part dimension is broadcast via threshold, not a hint") {
    val p = plan(Relational.qTopKParts)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("scans prune columns: q1 reads only the needed lineitem columns") {
    val p = plan(Relational.q1PricingSummary)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("semi/anti joins plan as join types, not materialized subqueries") {
    assert(plan(Relational.qSemiJoin).contains("LeftSemi"))
    assert(plan(Relational.qAntiJoin).contains("LeftAnti"))
  }

  test("q10: every join is broadcast — the fact side never shuffles for joins") {
    val p = plan(operators.RelationalTpch.q10ReturnedItems)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q14/q19: part joins still broadcast via threshold after hint removal") {
    assert(plan(operators.RelationalTpch.q14PromoRevenue).contains("BroadcastHashJoin"))
    assert(plan(operators.RelationalTpch.q19DisjunctiveBands).contains("BroadcastHashJoin"))
  }

  test("q19: the disjunctive quantity bands push into the lineitem scan") {
    val p = plan(operators.RelationalTpch.q19DisjunctiveBands)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("Or(") && pushed.contains("l_quantity"), pushed)
  }

  test("q6: shipdate + quantity predicates reach the parquet scan") {
    val p = operators.RelationalTpch.q6ForecastRevenue.fn(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity"), p)
  }

  test("q17: the per-part threshold plans ONE window, no lineitem re-scan join") {
    val p = plan(operators.RelationalTpch.q17SmallQtyRevenue)
    assert("Window".r.findAllIn(p).length >= 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("q_grouping_sets expands once (Expand operator), not one scan per set") {
    val p = plan(operators.RelationalAnalytics.qGroupingSets)
    assert(p.contains("Expand"), p)
    assert("FileScan".r.findAllIn(p).length == 1, p)
  }

  test("de-skewed analytics: no per-row window partitioned by the 3-value status key") {
    // q_outliers: moments via groupBy + broadcast join — zero Window nodes
    val po = plan(operators.RelationalAnalytics.qOutliers)
    assert(!po.contains("Window"), po)
    assert(po.contains("BroadcastHashJoin"), po)
    // q_window_distribution / q_exact_median: every window over the fact
    // rows is keyed by (range-partition | bucket, status); the skew shape —
    // a windowspec partitioned by o_orderstatus alone, ordered by
    // o_totalprice, i.e. one task per status — must not appear
    val skew = "windowspecdefinition\\(o_orderstatus#\\d+, o_totalprice".r
    val pd = plan(operators.RelationalAnalytics.qWindowDistribution)
    assert(skew.findFirstIn(pd).isEmpty, pd)
    val pm = plan(operators.RelationalAnalytics.qExactMedian)
    assert(skew.findFirstIn(pm).isEmpty, pm)
  }

  test("q_det_sample: single pruned scan, codegen'd filter, partial agg") {
    // pins the shape behind SURVEY §6's round-4 finding: the plan is a
    // one-column-family scan + in-codegen md5-prefix filter + partial
    // aggregate — any regression that could explain a multi-x timing jump
    // (extra scan, broken partial agg, codegen fallback) fails here
    val p = plan(operators.RelationalAnalytics.qDetSample)
    assert("FileScan".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_custkey"), readSchema)
  }

  test("lake_constraints FK check is a broadcast anti-join via threshold, not a hint") {
    val p = plan(operators.IngestLake.lakeConstraints)
    assert(p.contains("BroadcastHashJoin LeftAnti") ||
      (p.contains("LeftAnti") && p.contains("BroadcastExchange")), p)
  }

  test("deletion vectors subtract via a broadcast anti-join, never a shuffled one") {
    import java.nio.file.Files
    val cat = graft.lake.LakeCatalog(spark,
      Files.createTempDirectory("graft_dvplan").toString)
    import spark.implicits._
    cat.write("ns", "t", (1 to 1000).map(i => (i, i * 2)).toDF("id", "x"))
    cat.deleteMoR("ns", "t", col("id") <= 5)
    val p = cat.read("ns", "t").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV subtraction must be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // vector-free snapshots keep the plain scan: no join, no _metadata
    val clean = cat.read("ns", "t", Some(1)).queryExecution.executedPlan.toString
    assert(!clean.contains("Join"), s"vector-free read must not plan a join:\n$clean")
  }

  test("ann_quantized: bounds broadcast; no shuffle added over plain brute force") {
    val p = plan(operators.Similarity.annQuantized)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    val brute = plan(operators.Similarity.annBruteforce)
    val bruteExchanges = "Exchange hashpartitioning".r.findAllIn(brute).length
    assert(exchanges <= bruteExchanges + 1, // +1: the tiny bounds aggregation
      s"quantized search added shuffles: $exchanges vs brute's $bruteExchanges\n$p")
    assert("BroadcastExchange".r.findAllIn(p).length >= 2, p) // bounds + queries
  }

  test("ann_pq: encode is a shuffle-free projection — no SortAggregate, no Generate") {
    val p = plan(operators.Similarity.annPq)
    // the r6 explode→join→min(struct) encode planned SortAggregate (struct
    // buffers don't hash-aggregate) over corpus×256 rows; the expression
    // encode must keep both the explode (Generate) and any aggregate out
    assert(!p.contains("SortAggregate"), p)
    assert(!p.contains("Generate"), p)
    assert(p.contains("graft_pq_recon"), p)
    // only the top-k window shuffles: one hash exchange (rank) + the final
    // ordering's range exchange — nothing from the encode side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"encode added shuffles ($exchanges):\n$p")
  }

  test("AQE splits a planted-skew sort-merge join (skew=true in the final plan)") {
    // the CI pin behind ScaleProbe's skew canary: §4's fact-fact skew
    // story depends on AQE actually detecting and splitting a hot key's
    // partition — assert the mechanism engages on a planted 50%-one-key
    // skew once thresholds are scaled down to test-data sizes
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the runtime tier must be off too: with it on, AQE converts the small
    // side to broadcast from its ACTUAL shuffle bytes and no skewed
    // shuffle join is left to split
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      // the payload column must survive pruning (max() in the agg) and be
      // incompressible enough that the hot partition's COMPRESSED shuffle
      // size crosses the detector threshold — 100k identical keys alone
      // lz4 down to a few KB and the skew never registers
      val left = spark.range(200000L).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(20000L).select(col("id").as("k"), (col("id") * 3L).as("rv"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("c"), max("payload").as("p"))
      val c = joined.collect()(0).getLong(0)
      assert(c == 110000L, s"join result wrong: $c") // 100k hot-key + 10k odd k<20000
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q21: the lineitem self-correlations reuse one exchange (no third scan shuffle)") {
    // the EXISTS/NOT-EXISTS pair both shuffle lineitem on l_orderkey —
    // Spark must plan a ReusedExchange for the second, or the self-join
    // shape pays the fact-table shuffle twice at 100 TB
    val p = plan(operators.RelationalTpch.q21WaitingSuppliers)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(p).length <= 2,
      s"lineitem self-joins must share the orderkey exchange:\n$p")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
  }

  test("q7: both nation roles broadcast; q13 left join preserves zero-order customers in plan") {
    val p7 = plan(operators.RelationalTpch.q7VolumeShipping)
    assert("BroadcastHashJoin".r.findAllIn(p7).length >= 2, p7)
    val p13 = plan(operators.RelationalTpch.q13OrderDistribution)
    assert(p13.contains("LeftOuter"), p13)
    assert(p13.contains("partial_count"), s"both aggregation levels must partial-agg:\n$p13")
  }

  test("text_bpe_roundtrip plans one documents scan and no shuffle before the encode") {
    val p = plan(operators.BpeTokenizer.textBpeRoundtrip)
    assert("FileScan".r.findAllIn(p).length == 1, p)
    // mapPartitions encode is a narrow map: the only exchange allowed is
    // the final orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"encode path must not shuffle:\n$p")
  }

  test("text_rarity: vocabulary join is broadcast (map-side OOV scoring)") {
    val p = plan(operators.TextAnalysis.textRarity)
    assert(p.contains("BroadcastHashJoin"),
      s"top-V vocab must broadcast, not shuffle the token stream:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-V vocab should plan as a bounded top-k, not a global sort:\n$p")
  }

  test("q2: the scalar-min decorrelates to ONE window over l_partkey, no fact self-join") {
    val p = plan(operators.RelationalTpch.q2MinCostSupplier)
    assert("Window".r.findAllIn(p).length == 1,
      s"min-cost must be a single window, not a re-scan join:\n$p")
    // 5 tables (lineitem supplier nation region part), each scanned once
    assert("FileScan parquet".r.findAllIn(p).count(_ => true) <= 5 &&
      !p.contains("CartesianProduct"),
      s"each table scans once:\n$p")
  }

  test("q4: EXISTS plans as a LEFT SEMI join with the agg after it") {
    val p = plan(operators.RelationalTpch.q4OrderPriority)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_count"), s"priority agg must partial-agg:\n$p")
  }

  test("q8: both nation roles + region broadcast; single grouped ratio agg") {
    val p = plan(operators.RelationalTpch.q8MarketShare)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    // numerator and denominator ride ONE aggregation — two sums under one
    // group-by, never two scans of the joined fact
    assert("partial_sum".r.findAllIn(p).length >= 2, p)
    assert("FileScan parquet [^\\n]*lineitem".r.findAllIn(p).length == 1,
      s"lineitem scans once for both sums:\n$p")
  }

  test("q15: the scalar max broadcasts as one row — no global window, no second fact scan") {
    val p = plan(operators.RelationalTpch.q15TopSupplier)
    assert(!p.contains("Window"),
      s"a global-max window would single-partition the view:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row max must broadcast:\n$p")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      "FileScan parquet [^\\n]*lineitem".r.findAllIn(p).length <= 2,
      s"rev is computed once and reused for its own max:\n$p")
  }

  test("q20: the nested qualification chain plans as semi joins end to end") {
    val p = plan(operators.RelationalTpch.q20VolumeSuppliers)
    assert("LeftSemi".r.findAllIn(p).length >= 2,
      s"part filter and supplier qualification must both be semi joins:\n$p")
    assert(p.contains("partial_sum"),
      s"the qty aggregate must map-side combine:\n$p")
  }

  test("q11: the scalar total broadcasts as one row — no global window") {
    val p = plan(operators.RelationalTpch.q11ImportantStock)
    assert(!p.contains("Window"),
      s"a global-total window would single-partition the view:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row total must broadcast:\n$p")
    assert(p.contains("LeftSemi"),
      s"nation-band supplier qualification must be a semi join:\n$p")
    assert(p.contains("partial_sum"),
      s"per-part value must map-side combine:\n$p")
  }

  test("dedup_semantic: assignment is a pure projection; screen shuffles once on cluster") {
    val p = plan(operators.Dedup.dedupSemantic)
    assert(p.contains("graft_nearest_centroid"),
      s"assignment must be the centroid-bound codegen expression:\n$p")
    assert(!p.contains("Generate") && !p.contains("CartesianProduct"),
      s"no explode / cross product anywhere in the pipeline:\n$p")
    // exchanges: the cluster-key join (reused across both sides where
    // possible) + the keep-first aggregation — never one per centroid
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$p")
  }

  test("q16: NOT IN plans as anti join; distinct count is two-phase") {
    val p = plan(operators.RelationalTpch.q16SupplierRelationship)
    assert(p.contains("LeftAnti"),
      s"bad-supplier exclusion must be a left-anti join:\n$p")
    assert(p.contains("partial_count(distinct") || p.contains("count(distinct"),
      s"distinct supplier count must use the two-phase distinct aggregate:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_event_buckets: canonicalized ts keeps pruning, map-side combine and codegen") {
    // the round-8 testdata regeneration changed the ts encoding under the
    // operators; this pins that the recovery (Tables.events canonicalization
    // + unix_micros derivation) did not cost the plan its scan pruning or
    // its partial aggregation
    val p = plan(Relational.qEventBuckets)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("event_id"),
      s"events scan must prune untouched columns:\n$readSchema")
    assert(p.contains("partial_"), s"hourly rollup must combine map-side:\n$p")
    // (WholeStageCodegen spans are not visible in the pre-execution AQE
    // plan string — isFinalPlan=false — so codegen is not asserted here)
  }

  test("q_sessionize: window and session agg share ONE user_id shuffle") {
    val p = plan(Relational.qSessionize)
    // HashPartitioning(user_id) satisfies the (user_id, session_id) agg's
    // clustering, so only the window shuffle + the final orderBy's range
    // exchange appear — a third hash exchange means the reuse broke
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"expected <=1 hash exchange, got $hashEx:\n$p")
  }

  test("q_retention: day-distinct collapses BEFORE the cohort join") {
    // the cohort self-join must run over the per-(user, day) distinct rows
    // (bounded by users x active-days), never the raw event stream — at
    // 100 TB the distinct is what keeps the join input small
    val p = plan(operators.RelationalAnalytics.qRetention)
    assert(p.contains("partial_"), s"distinct must partial-aggregate map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"cohorts (small) must broadcast:\n$p")
  }

  test("q_window_range: one user_id exchange feeds the range-frame window") {
    val p = plan(operators.RelationalAnalytics.qWindowRange)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"expected <=1 hash exchange, got $hashEx:\n$p")
    assert(p.contains("RangeFrame"), s"frame must be a RANGE frame:\n$p")
  }

  test("q_sketch_kmv: bounded heap before the shuffle; no windowed full sort") {
    val p = plan(operators.Relational.qSketchKmv)
    assert(p.contains("TopKPerGroup"),
      s"k-minimum selection must run through the bounded-heap operator:\n$p")
    // never the row_number()-over-full-sort formulation the oracle uses
    assert(!p.contains("row_number"), s"no window rank on the engine side:\n$p")
    // distinct pairs + TopK group reduction; the final tiny agg reuses the
    // TopK partitioning — 2 hash exchanges total, constant at any SF
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$p")
  }

  // ----- ANN rank stages: bounded-heap cut, never a corpus-wide window ----
  // The row_number().over(partitionBy(query_id)) formulation funnels each
  // query's ENTIRE candidate stream through one reducer task (VERDICT r11
  // "What's wrong #2"). Pinned: every window in these plans sits ABOVE a
  // TopKPerGroup cut, so its sort input is bounded by k, not the corpus.

  /** every Window node's subtree must contain a TopKPerGroup reduction —
    * in the printed tree (parents first) each "Window" line must be
    * followed by a "TopKPerGroup" line
    */
  private def assertWindowsAboveTopK(p: String): Unit = {
    val lines = p.linesIterator.toIndexedSeq
    val windowIdx = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Window") => i
    }
    assert(windowIdx.nonEmpty == p.contains("Window"))
    windowIdx.foreach { wi =>
      assert(lines.drop(wi + 1).exists(_.contains("TopKPerGroup")),
        s"window at plan line $wi has no bounded TopKPerGroup cut below it:\n$p")
    }
  }

  test("ann_bruteforce: rank rides the bounded-heap cut, not a per-query full sort") {
    val p = plan(operators.Similarity.annBruteforce)
    assert(p.contains("PartialTopKPerGroup"),
      s"candidates must reduce map-side before the exchange:\n$p")
    assertWindowsAboveTopK(p)
  }

  test("ann_jl_sketch: BOTH stages (prefilter + exact) cut via TopKPerGroup") {
    val p = plan(operators.Similarity.annJlSketch)
    val partials = "PartialTopKPerGroup".r.findAllIn(p).length
    assert(partials >= 2,
      s"expected the srank prefilter AND the exact rank to reduce map-side, got $partials:\n$p")
    assertWindowsAboveTopK(p)
  }

  test("ann_imi_det: the corpus-bounded rank rides TopKPerGroup; probe windows stay model-bounded") {
    val p = plan(operators.Similarity.annImiDet)
    // the CANDIDATE rank (corpus-proportional input) must reduce map-side
    assert(p.contains("PartialTopKPerGroup"), s"ann_imi_det:\n$p")
    // exactly FOUR Windows are allowed: the three probe ranks (side A,
    // side B, pair rank — inputs are queries × codebook, ≤ NumQueries ×
    // kSide rows, a MODEL artifact, then nProbe² pairs) and the final
    // rank-labeling window whose input is already the TopK cut (bounded
    // by k per query). A fifth would mean a window leaked onto the
    // corpus side, which only the assignment projection and the
    // probed-cell join + TopK cut may touch.
    val windows = """(?m)(?:^|\s)Window\s\[""".r.findAllIn(p).length
    assert(windows == 4,
      s"expected the 3 probe windows + the rank label window, got $windows:\n$p")
    // the rank-label window (first in the parents-first print) must sit
    // ABOVE the TopK cut — its input is k-bounded, never the corpus
    val lines = p.linesIterator.toIndexedSeq
    val firstWindow = lines.indexWhere(_.contains("Window ["))
    assert(lines.drop(firstWindow + 1).exists(_.contains("TopKPerGroup")),
      s"final rank window has no bounded cut below it:\n$p")
  }

  test("ann_lsh / ann_quantized / ann_pq: same bounded rank shape") {
    Seq(operators.Similarity.annLsh, operators.Similarity.annQuantized,
      operators.Similarity.annPq).foreach { q =>
      val p = plan(q)
      assert(p.contains("PartialTopKPerGroup"), s"${q.name}:\n$p")
      assertWindowsAboveTopK(p)
    }
  }

  // ----- honest-statistics broadcast (plans/HonestBroadcast.scala) --------
  // The static threshold sits at 1 MB (estimates lie); the rule recovers
  // STAGE-FREE dim broadcasts from exact footer row counts. Both directions
  // pinned: a proven-small dim side broadcasts with no shuffle stage, and
  // a side whose EXACT rows exceed the bound is never hinted — no matter
  // how small its byte ESTIMATE claims to be.

  test("honest broadcast: dim side hinted from exact footer rows, no dim shuffle") {
    val t = Tables(spark, sfDir)
    // part at sf0.001 estimates ABOVE the 1 MB static threshold once the
    // whole row is projected, so without the rule this join would stage a
    // shuffle first (AQE converts later); the rule proves it small from
    // footers and the INITIAL plan is already a broadcast join
    val joined = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly one exchange (the aggregate's) — the dim join added none
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"dim join must not add a shuffle stage:\n$p")
  }

  test("honest broadcast: exact row count disqualifies, regardless of estimate") {
    val t = Tables(spark, sfDir)
    val key = "spark.graft.honestBroadcast.threshold"
    val prev = spark.conf.getOption(key)
    // a threshold below any relation's honest bytes = every side
    // disqualified by its EXACT rows (this is the fact-side guarantee:
    // the 15M-row sf10 orders side can never sneak back in through a
    // small estimate — its footer count disqualifies it at any estimate)
    spark.conf.set(key, "64")
    try {
      val joined = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
      val analyzed = joined.queryExecution.optimizedPlan.toString
      assert(!analyzed.contains("broadcast"),
        s"no broadcast hint may appear with rows over the bound:\n$analyzed")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("honest broadcast: a filtered projection still qualifies (overcount-safe)") {
    val t = Tables(spark, sfDir)
    val dim = t.part.filter(col("p_size") > 10).select("p_partkey", "p_brand")
    val joined = t.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("honest broadcast: huge-string dims are disqualified by footer bytes") {
    // few rows, KB-sized strings: rows x defaultSize(20) claims ~100 KB
    // while the real hash relation is ~200 MB — the VERDICT r11 item 4
    // failure. The byte bound must come from the footer's per-column
    // total_uncompressed_size, so this side is NOT hinted.
    val dir = java.nio.file.Files.createTempDirectory("graft_fat_")
    try {
      import spark.implicits._
      val payload = "x" * 65536
      (0 until 3000).map(i => (i.toLong, payload + i))
        .toDF("fk", "fat").write.mode("overwrite")
        .parquet(dir.resolve("fat").toString)
      val fat = spark.read.parquet(dir.resolve("fat").toString)
      val t = Tables(spark, sfDir)
      // the probe side is an AGGREGATE (never footer-provable) and the
      // static/AQE thresholds are off, so the ONLY broadcast source would
      // be the honest rule proving the string side small
      val probe = t.lineitem.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      val thr = "spark.sql.autoBroadcastJoinThreshold"
      val aqeThr = "spark.sql.adaptive.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(thr)
      val prevAqe = spark.conf.getOption(aqeThr)
      spark.conf.set(thr, "-1"); spark.conf.set(aqeThr, "-1")
      try {
        val joined = probe.join(fat, col("l_partkey") === col("fk"))
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastHashJoin"),
          s"a 3000-row/196MB-string side must not be footer-proven small:\n$p")
        // control: the same shape with a narrow string IS proven and hinted
        (0 until 3000).map(i => (i.toLong, s"n$i"))
          .toDF("fk", "thin").write.mode("overwrite")
          .parquet(dir.resolve("thin").toString)
        val thin = spark.read.parquet(dir.resolve("thin").toString)
        val joined2 = probe.join(thin, col("l_partkey") === col("fk"))
        assert(joined2.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
          "narrow-string control must still broadcast")
      } finally {
        spark.conf.set(thr, prev)
        prevAqe.fold(spark.conf.unset(aqeThr))(spark.conf.set(aqeThr, _))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("honest broadcast: dictionary-compressed repetitive wide strings are not under-counted") {
    // ADVICE r12: one KB-sized value repeated across many rows dictionary-
    // encodes to ~1-2 B/row ON PAGE (total_uncompressed_size counts dict +
    // indices), while the hash relation holds the EXPANDED 1 KB/row. The
    // bound must come from size statistics or the dictionary page
    // (valueCount x longest entry) — never the on-page figure. Size
    // statistics are DISABLED on the write so the dictionary-page path is
    // what this pins; Spark's default write (size stats on) is covered by
    // being strictly more informative.
    val dir = java.nio.file.Files.createTempDirectory("graft_dict_")
    try {
      import spark.implicits._
      val payload = "x" * 1024
      (0 until 200000).map(i => (i.toLong % 1000, payload))
        .toDF("fk", "fat").write.mode("overwrite")
        .option("parquet.size.statistics.enabled", "false")
        .parquet(dir.resolve("fat").toString)
      val fat = spark.read.parquet(dir.resolve("fat").toString)
      val t = Tables(spark, sfDir)
      val probe = t.lineitem.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      val thr = "spark.sql.autoBroadcastJoinThreshold"
      val aqeThr = "spark.sql.adaptive.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(thr)
      val prevAqe = spark.conf.getOption(aqeThr)
      spark.conf.set(thr, "-1"); spark.conf.set(aqeThr, "-1")
      try {
        val joined = probe.join(fat, col("l_partkey") === col("fk"))
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastHashJoin"),
          s"a dict-compressed 200MB-expanded side must not be proven small:\n$p")
        // control: the same shape with a repetitive THIN value stays
        // provable through the dictionary bound — common dims (every
        // low-cardinality string column) must not lose their broadcast
        (0 until 200000).map(i => (i.toLong % 1000, s"c${i % 7}"))
          .toDF("fk", "thin").write.mode("overwrite")
          .option("parquet.size.statistics.enabled", "false")
          .parquet(dir.resolve("thin").toString)
        val thin = spark.read.parquet(dir.resolve("thin").toString)
        val joined2 = probe.join(thin, col("l_partkey") === col("fk"))
        assert(joined2.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
          "repetitive thin-string control must still broadcast")
      } finally {
        spark.conf.set(thr, prev)
        prevAqe.fold(spark.conf.unset(aqeThr))(spark.conf.set(aqeThr, _))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("honest broadcast: computed variable-width outputs are not provable") {
    val t = Tables(spark, sfDir)
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val aqeThr = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thr)
    val prevAqe = spark.conf.getOption(aqeThr)
    spark.conf.set(thr, "-1"); spark.conf.set(aqeThr, "-1")
    try {
      // repeat() could blow a 1-byte scan column into anything — no footer
      // column bounds it, so the side must stay unhinted (probe side is an
      // aggregate: unprovable, so no broadcast may appear at all)
      val dim = t.part.select(col("p_partkey"),
        repeat(col("p_brand"), 100000).as("blown"))
      val probe = t.lineitem.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      val joined = probe.join(dim, col("l_partkey") === col("p_partkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"computed variable-width output must not be footer-proven:\n$p")
    } finally {
      spark.conf.set(thr, prev)
      prevAqe.fold(spark.conf.unset(aqeThr))(spark.conf.set(aqeThr, _))
    }
  }

  test("honest broadcast: joins/aggregates below the side are never proven small") {
    val t = Tables(spark, sfDir)
    // an aggregate side could legitimately broadcast, but the rule must
    // not CLAIM to prove it from footers (output rows != scan rows); it
    // stays with the estimate policy. Disable the static threshold so the
    // only possible broadcast source would be the honest rule.
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val aqeThr = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thr)
    val prevAqe = spark.conf.getOption(aqeThr)
    spark.conf.set(thr, "-1")
    spark.conf.set(aqeThr, "-1")
    try {
      val agg = t.part.groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      val joined = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
        .join(agg, "p_brand")
      val p = joined.queryExecution.executedPlan.toString
      // the scan side (part) is proven; the aggregate side is not
      val bhj = "BroadcastHashJoin".r.findAllIn(p).length
      assert(bhj == 1, s"exactly the footer-proven side broadcasts:\n$p")
    } finally {
      spark.conf.set(thr, prev)
      prevAqe.fold(spark.conf.unset(aqeThr))(spark.conf.set(aqeThr, _))
    }
  }
}
