package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Pins the physical-plan shapes PLANS.md claims — the properties that
  * matter at 100 TB, asserted on the real registered queries so a
  * regression (a lost pushdown, a broadcast that became a shuffle, a
  * top-k that became a global sort) fails the suite instead of only
  * showing up in a bench sample.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("p1: isin filter is pushed to the parquet scan") {
    val p = plan("p1_filter_isin")
    assert(p.contains("In(l_returnflag") && p.contains("PushedFilters: [IsNotNull(l_quantity)"), p)
  }

  test("q5: dimension sides join by broadcast, not shuffle") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("c2: stratified sample bounds map output with WindowGroupLimit") {
    val p = plan("c2_stratified_sample")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("GlobalLimit 50"), p) // per-stratum, not global
  }

  test("v6: kNN join has partial+final WindowGroupLimit around one exchange") {
    val p = plan("v6_knn_join")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("t9: BM25 top-k is TakeOrdered, never a global sort") {
    val p = plan("t9_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort [score"), p)
  }

  test("c6/t10/t12: scan-stage ops plan with zero exchange") {
    Seq("c6_split_assign", "t10_pii_scrub", "t12_quality_model").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should not shuffle:\n$p")
    }
  }

  test("j5: fuzzy join expands rows via hash joins; no corpus-level nested loop") {
    val p = plan("j5_fuzzy_join")
    // the |V|² distinct-name distance table may compare by broadcast
    // nested loop (value-bounded by design); the ROW joins must be
    // equi-hash and nothing may plan a cartesian product
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t14: TF-IDF top-k bounds map output with WindowGroupLimit; df broadcasts") {
    val p = plan("t14_tfidf")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("v7: quantization ranges broadcast back onto the long-form stream") {
    val p = plan("v7_quantize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d8: span report is TakeOrdered, never a global sort") {
    val p = plan("d8_dup_spans")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("d11b forces the prefix containment plan; d11 probes into bitmap here") {
    // d11b is the web-corpus plan under the oracle gate: graft_overlap
    // merge-walk verify, no bitmap popcount. d11 on this bounded-vocab
    // corpus must keep choosing the popcount plan.
    val pb = plan("d11b_containment_prefix")
    assert(pb.contains("graft_overlap"), pb)
    assert(!pb.contains("bit_count"), pb)
    val p = plan("d11_containment_join")
    assert(p.contains("bit_count"), p)
  }

  test("a13: histogram range is a broadcast, bin+count stay one aggregate") {
    val p = plan("a13_histogram")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("u8: CDC merge plans as a single equi join, no cartesian") {
    val p = plan("u8_merge_upsert")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("u13: bucketed fact join runs co-located — only the final agg shuffles") {
    val p = plan("u13_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // exactly ONE Exchange in the whole plan: hashpartitioning on
    // o_orderstatus for the final aggregate. Zero below the join —
    // both scans are bucketed by the join key.
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 Exchange (final agg), got $exchanges:\n$p")
  }

  test("u13: a point lookup on the bucket key prunes to one bucket") {
    SparkEntry.queries("u13_bucketed_join")(spark, sf()) // ensures tables staged
    val tag = new java.io.File(sf()).getName.replaceAll("[^A-Za-z0-9]", "_")
    // a bare point lookup has no join/agg for autoBucketedScan to
    // optimize, so pin the bucketed read on for the pruning path
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val p = spark.table(s"graft_bkt_lineitem_$tag")
        .filter(org.apache.spark.sql.functions.col("l_orderkey") === 42L)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning must skip 7/8 of the data:\n$p")
    } finally spark.conf.set(key, before)
  }

  test("u14: one-day query reads exactly one partition directory") {
    val df = SparkEntry.queries("u14_partition_pruned_scan")(spark, sf())
    // inputFiles reports the pre-pruning listing; the pruned set lives
    // on the scan node itself.
    val top = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = top.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val listing = scans.head.selectedPartitions
    val parts = listing.toPartitionArray
      .map(f => new java.io.File(f.urlEncodedPath).getParentFile.getName).distinct
    assert(listing.partitionCount == 1 && parts.sameElements(Array("event_date=2024-01-01")),
      s"expected a single pruned partition, scanned: ${parts.mkString(",")}")
  }

  test("q15: the per-supplier revenue stage is computed once, reused for the max") {
    val df = SparkEntry.queries("q15_top_supplier")(spark, sf())
    try {
      df.collect()
      // The persisted per-supplier relation must make the fact scan
      // unique — without it AQE leaves two identical scan→agg
      // subtrees (verified; its stage cache does not dedupe them).
      // Walk the final adaptive tree WITHOUT descending into cached
      // relations: no direct lineitem FileScan may remain, and both
      // consumers must read the cache.
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val nodes = flatten(df.queryExecution.executedPlan)
      val factScans = nodes.collect {
        case f: FileSourceScanExec if f.metadata.get("Location").exists(_.contains("lineitem")) => f
      }
      assert(factScans.isEmpty, s"fact scanned outside the cache: $factScans")
      val cacheReads = nodes.count(_.getClass.getSimpleName.contains("InMemoryTableScan"))
      assert(cacheReads == 2, s"expected both consumers on the cache, got $cacheReads")
    } finally spark.catalog.clearCache()
  }

  test("ev26: sliding distinct fans out to the calendar broadcast, one keyed agg") {
    val p = plan("ev26_dau_mau")
    assert(p.contains("BroadcastHashJoin"), p) // report-day calendar broadcasts
    assert(!p.contains("SortMergeJoin"), p)    // the fact side never re-shuffles to join
  }

  test("j9: grid-blocked interval overlap joins on cells — no nested-loop fallback") {
    val p = plan("j9_interval_overlap")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("a48: HITS half-rounds broadcast the score table onto the edge list") {
    val p = plan("a48_hits_authority")
    // both per-round score joins (a1 onto edges, h1 onto edges) broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-20 never a global sort
  }

  test("u24/u26: parent key sets and subject cohorts join by broadcast") {
    Seq("u24_fk_discovery", "u26_erasure_impact").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
    }
  }

  test("t37: distinctive-terms top-5 per source bounds candidates with WindowGroupLimit") {
    val p = plan("t37_distinctive_terms")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("u33: fact scan carries a dynamic partition-pruning filter from the dim side") {
    val p = plan("u33_dpp_join")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected DynamicPruningExpression on the partitioned scan:\n$p")
  }

  test("t47: TextRank top-10 is TakeOrdered over the checkpointed rank table, no global sort") {
    // the per-round joins run during PageRank's checkpointed loop (see
    // PageRankSpec for their shape); the REGISTERED plan must be just
    // the bounded top-k over the final rank table.
    val p = plan("t47_textrank")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("v27: Davies-Bouldin point-distance pass broadcasts centroid sums, never shuffles vectors twice") {
    val p = plan("v27_davies_bouldin")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t53: hashing-trick matmul ships no model — no broadcast, no global window") {
    val p = plan("t53_doc_topic_matmul")
    assert(!p.contains("BroadcastExchange"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("WindowGroupLimit"), p) // top-2 bounds map output
  }

  test("v31: both RRF rank windows share one query_id shuffle") {
    val p = plan("v31_rrf_fusion")
    assert("Exchange hashpartitioning\\(query_id".r.findAllIn(p).size == 1,
      s"expected the cosine and dot rank windows to reuse one exchange:\n$p")
    assert(p.contains("BroadcastExchange"), p) // query side broadcasts
  }

  test("m8: phash band join is equi-hash, never cartesian") {
    val p = plan("m8_phash_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j12: blocked linkage pairs join on the block key, never cartesian") {
    val p = plan("j12_linkage_score")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }

  test("w16: Hampel med+MAD are frame-local — one user window, no extra shuffle") {
    val p = plan("w16_hampel_outliers")
    assert(!p.contains("SinglePartition"), p)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("ev69: interval-union sweep never sorts globally") {
    val p = plan("ev69_interval_union")
    assert(!p.contains("SinglePartition"), p)
  }

  test("q34: null-rejecting filters eliminate both LEFT joins (EliminateOuterJoin)") {
    val opt = SparkEntry.queries("q34_outer_join_elim")(spark, sf())
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("LeftOuter"),
      s"expected both left joins rewritten to inner:\n$opt")
    val p = plan("q34_outer_join_elim")
    assert(p.contains("BroadcastHashJoin"), p) // inner form unlocks broadcast
  }

  test("q33: semi-join reduction never shuffles the fact — both joins broadcast") {
    val p = plan("q33_semi_join_reduction")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q35: filter authored above the window lands in the parquet scan") {
    val p = plan("q35_window_pushdown")
    assert(p.contains("LessThan(user_id,500)"),
      s"expected the partition-key predicate pushed through Window into PushedFilters:\n$p")
  }

  test("v49: k-center relax pass is one broadcast of a single center row") {
    val p = plan("v49_kcenter_coreset")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
