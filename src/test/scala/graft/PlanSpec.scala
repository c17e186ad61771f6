package graft

import graft.queries.{Geo, Relational, Training}


/** Physical-plan assertions — the properties that make these queries hold
  * at 100 TB: filters reach the parquet scan, small dims broadcast, top-k
  * never global-sorts, hot paths stay in whole-stage codegen, and text/
  * similarity pipelines contain no (un-codegen-able) UDF nodes.
  */
class PlanSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02 filter+project: predicates push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p)
    // pruned read schema — no unreferenced columns in the scan
    assert(!p.contains("l_comment"), p)
  }

  test("q08 dimension joins broadcast") {
    val p = plan("q08_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q24 top-k plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q24_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q46 spatial join: broadcast on cell id, no shuffle of the point side") {
    val p = plan("q46_spatial_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("graft_st_contains"), p) // exact refine stays a filter
  }

  test("q01 agg uses partial aggregation (map-side combine)") {
    val p = plan("q01_agg_sum")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
  }

  test("q96 tz-offset dim joins broadcast (no shuffle of the fact side)") {
    val p = plan("q96_tz_localize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q98 IVF probes broadcast the codebook and query cells") {
    val p = plan("q98_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("text/similarity pipelines contain no UDF nodes") {
    for (q <- Seq("q52_lang_id", "q55_fingerprint", "q59_minhash_lsh",
        "q61_cosine_topk", "q84_chunking", "q98_ann_ivf")) {
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ArrowEvalPython") &&
        !p.toLowerCase.contains("scalaudf"), s"$q has a UDF node:\n$p")
    }
  }

  test("q61 cosine top-k broadcasts the query side") {
    val p = plan("q61_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q107 decontamination broadcasts the benchmark shingle set") {
    // the training corpus (big side) must not shuffle for the overlap join
    val p = plan("q107_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q111 quantization broadcasts the per-dim stats frame") {
    val p = plan("q111_quantize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q118 star join: dims broadcast, region filter reaches its scan") {
    val p = plan("q118_star_join")
    // all three dimension joins broadcast; only the fact-fact join may shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    // The filter must appear in a scan's PushedFilters line specifically —
    // a bare `p.contains("r_name")` is vacuous (any plan touching region
    // mentions the column) and `EqualTo(...)` alone would also match a
    // post-scan Filter node, i.e. a pushdown regression.
    assert("""PushedFilters: \[[^\]]*EqualTo\(r_name,ASIA\)""".r
      .findFirstIn(p).isDefined, p)
  }

  test("q112 group sampling runs through TopKPerKeyExec, not a window sort") {
    val p = plan("q112_group_sample")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
  }

  test("q134 weighted sample: bounded-heap TopKPerKey, no window sort") {
    val p = plan("q134_weighted_sample")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
    // weight filter reaches the scan
    assert(p.contains("GreaterThan(n_chars,0)"), p)
  }

  test("q123 session windows: dedicated merging exec, one shuffle on the key") {
    val p = plan("q123_session_window")
    assert(p.contains("MergingSessions"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("q141 tpch q3: date filters reach the scans, top-10 never global-sorts") {
    val p = plan("q141_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
    // both fact-side predicates pushed into their parquet scans
    assert(p.contains("GreaterThan(l_shipdate"), p)
    assert(p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("q143 EXISTS subqueries decorrelate to joins (no per-row loop)") {
    val p = plan("q143_exists_subquery")
    // NOT EXISTS -> anti join; projected EXISTS -> existence join
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("ExistenceJoin"), p)
    assert(!p.toLowerCase.contains("subquery"), p)
  }

  test("q126 bm25: stats broadcast, bounded top-k, no shuffle join") {
    val p = plan("q126_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q100 salted join: every expression is deterministic (retry-safe salt)") {
    // A nondeterministic salt (rand, monotonically_increasing_id) used as a
    // shuffle/join key duplicates or drops rows under partial stage
    // recomputation (SPARK-23207 hazard class) — the salt must come from
    // row content so retried tasks reproduce it.
    val df = SparkEntry.queries("q100_salted_join")(spark, sf)
    val nondet = df.queryExecution.analyzed.collect { case p =>
      p.expressions.flatMap(_.collect { case e if !e.deterministic => e })
    }.flatten
    assert(nondet.isEmpty, s"nondeterministic expressions in salted join: $nondet")
  }

  test("q153 radius join is an equi-join on cell id, never a cross product") {
    val p = plan("q153_radius_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q147 correlation matrix is ONE pass over lineitem") {
    // 14 sums in a single partial+final aggregate; a naive per-pair plan
    // would scan the fact table 6 times.
    val p = plan("q147_corr_matrix")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q155 AUC ranks without a single-partition global window") {
    // the scalable global-rank path sorts range-partitioned and assigns
    // indices via zipWithIndex — no Window operator at all.
    val p = plan("q155_auc")
    assert(!p.contains("Window"), p)
  }

  test("q177 basket pairs join on the order key, order total broadcasts") {
    val p = plan("q177_basket_affinity")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p) // the 1-row n_orders agg
    assert(p.contains("TakeOrderedAndProject"), p) // bounded top-100
  }

  test("whole-stage codegen covers the scan->filter->project hot path") {
    // codegen stages render as "*(n) Operator" in executedPlan.toString
    val p = plan("q02_filter_project")
    assert(p.contains("*(1) Filter") && p.contains("*(1) Project"), p)
  }

  test("q184/q187 eval reductions plan no Window and no UDF") {
    // everything reduces over K^2 (x B folds) confusion cells via
    // hash aggregation — a Window or ScalaUDF here would mean the eval
    // stopped being a pure groupBy cascade
    for (q <- Seq("q184_macro_f1_kappa", "q187_bootstrap_eval")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q: $p")
      assert(!p.contains("ScalaUDF"), s"$q: $p")
    }
  }

  test("q185 factor extraction iterates via joins, never a Window or cross product") {
    val p = plan("q185_global_factor_index")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q186 rank-window precision: zipWithIndex rank path, anchors broadcast") {
    // Ranking.globalRank assigns indices via range-sort + zipWithIndex —
    // a Window here would mean the single-partition global sort came back
    val p = plan("q186_precision_at_rank")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q188 factor fit reduces via joins — no Window, no cross product") {
    val p = plan("q188_factor_fit")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q189 per-class rank cut runs through TopKPerKey bounded heaps") {
    // the residual Window is partitioned by klass over the k-bounded frame;
    // what must never appear is a single-partition exchange (global sort)
    val p = plan("q189_precision_at_rank_by_class")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q190 dup spans: semi join back to windows, per-doc interval union only") {
    val p = plan("q190_dup_spans")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q191 topic sentiment is key-shuffles only — no Window, no global state") {
    val p = plan("q191_topic_sentiment")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q192 set diversity: rank cuts via zipWithIndex, pairs via broadcast") {
    // the only Window allowed is bruteForceTopK's per-query window
    // (partitioned by query_id); the 64-member sets ride a broadcast.
    // (A SinglePartition exchange DOES appear — it is the final 1-row
    // mean over the 64-row set, fed by a partial HashAggregate, which is
    // the correct shape for a global scalar; asserting its absence would
    // outlaw every global agg.)
    val p = plan("q192_set_diversity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q206 tpch q7: nation dims broadcast, ship-date range reaches the scan") {
    val p = plan("q206_tpch_q7")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThan(l_shipdate"), p)
  }

  test("q193 bpe encode: tokenized vocab broadcasts back to the corpus") {
    val p = plan("q193_bpe_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q194/q197 mixture & DSIR: totals and ratio tables ride broadcasts") {
    for (q <- Seq("q194_temperature_mix", "q197_dsir_weights")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("Window"), s"$q: $p")
    }
  }

  test("q199 incremental dedup: fingerprint equi-joins, no global state") {
    val p = plan("q199_incremental_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q204 stratified draw runs through TopKPerKey, not a window sort") {
    val p = plan("q204_eval_sample")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
  }

  test("q209 grouped sketch: partial-merge aggregate, no per-phrase window") {
    // the custom TypedImperativeAggregate must plan partial + final
    // ObjectHashAggregate (map-side sketch combine), never a Window
    val p = plan("q209_heavy_phrases_by_source")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("q201/q207/q208 key-partitioned shapes: no cross product, no global exchange") {
    for (q <- Seq("q201_repetition_rules", "q207_autocorr", "q208_cusum")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("Exchange SinglePartition"), s"$q: $p")
    }
  }

  test("q210 seedlist tagging is a pure map over the scan: no exchange at all") {
    val p = plan("q210_seedlist_tag")
    assert(!p.contains("Exchange"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q211/q214 ride broadcasts, never a cartesian product") {
    for (q <- Seq("q211_keyword_recall", "q214_tpch_q17")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q212 semdedup: broadcast centroids, cluster-keyed pair join, persisted assignment") {
    val p = plan("q212_semdedup")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q215 weighted draw runs through TopKPerKey, not a window sort") {
    val p = plan("q215_weighted_draw")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
  }

  test("q216 oov rate: bounded vocab cut + broadcast join, shared token scan") {
    val p = plan("q216_oov_rate")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q217 jw linkage: codegen expression in a bucket-keyed join, TopKPerKey argmax") {
    val p = plan("q217_jw_linkage")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q219 reconcile: mismatch list broadcast, fingerprint scans reused, no cartesian") {
    val p = plan("q219_table_reconcile")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q218 incremental agg: broadcast split, shared scan, key-shuffles only") {
    val p = plan("q218_incremental_agg")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q220 datasheet: both reports read the one persisted doc pass") {
    val p = plan("q220_datasheet")
    // two InMemoryTableScans = both report branches read the cached pass
    // (the cached relation re-prints its child FileScan, so scan-counting
    // the plan string would overcount)
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("q221 sdc release: one keyed aggregate, no window, no cross product") {
    val p = plan("q221_sdc_release")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q222 class balance: keyed-PrefixScan ranks (no window at all) + " +
      "broadcast cut") {
    val p = plan("q222_class_balance")
    // ranks come from PrefixScan.scanLongKeyed (PrefixScanExec plants a
    // range exchange — label has ~10 values, a keyed window would rank
    // in ~10 tasks); the only global piece is the 1-row min-class-count
    // broadcast
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("PrefixScan"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q223/q224/q227 pair constructions: keyed or broadcast joins, never cartesian") {
    for (q <- Seq("q223_triplets", "q224_containment", "q227_attribution")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q225 label propagation: generation cuts between rounds, lazy " +
      "final round") {
    // rounds 1-2 localCheckpoint (the q132/q145 lineage lesson), so the
    // final plan reads round 2's cut as a materialized-RDD scan; round 3
    // itself stays LAZY (the q324 rule — its only consumer is the final
    // select, so an eager cut there is a whole extra materialization
    // pass), which is exactly one window argmax in the final plan
    val p = plan("q225_label_prop")
    assert(p.contains("Scan ExistingRDD"), p)
    // exactly ONE Window operator: round 3's argmax. Rounds 1-2
    // re-planned would put three in the plan (the regressed-cut smell).
    assert("Window \\[".r.findAllIn(p).size == 1, p)
  }

  test("q226 skew diagnostics: bounded top cut, shared counts pass") {
    val p = plan("q226_skew_diagnostics")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q228 sparsify is a pure map over the scan: no exchange at all") {
    val p = plan("q228_sparsify")
    assert(!p.contains("Exchange"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q229-q235 analytics batch: keyed shuffles and broadcasts only") {
    for (q <- Seq("q229_source_overlap", "q230_burstiness", "q231_histogram",
        "q232_weighted_median", "q233_cuped", "q234_srm_check", "q235_did")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
    }
  }

  test("q213 constraint suite: one aggregate pass unpivoted by a generator") {
    val p = plan("q213_constraints")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Window"), p)
    // exactly one scan of documents — every metric comes from the same pass
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q242 GPS pipeline: polygon cells and tz offsets broadcast; the " +
      "only shuffles are keyed (stops, labeling) — never a global sort") {
    val p = plan("q242_gps_pipeline")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p) // 2x geocode + tz
    assert(!p.contains("CartesianProduct"), p)
    // every exchange is hash partitioning on keys — the pings never
    // range-shuffle through a global sort
    assert(!"Exchange rangepartitioning".r.findFirstIn(p).isDefined, p)
  }

  test("q243 O-D flows: per-user window, no single-partition window") {
    val p = plan("q243_od_flows")
    assert(p.contains("Window"), p)
    // the lag window is keyed by user_id — a Window with an empty
    // partition spec would print 'Window [...], [m ASC' with no
    // partition expressions and plan a SinglePartition exchange
    assert(!p.contains("SinglePartition"), p)
  }

  test("q244 active-learning select: every strategy cut is a bounded " +
      "top-k (TakeOrderedAndProject), never a global sort") {
    val p = plan("q244_active_learning_select")
    assert("TakeOrderedAndProject".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("Sort ["), p)
  }

  test("q83 tfidf: term counts are map-side (no explode before the " +
      "pair aggregate) and the df join broadcasts under AQE sizes") {
    val p = plan("q83_tfidf")
    // one generator only — the per-doc (term, tc) struct explode; the
    // old occurrence-level explode + re-aggregate shape had Generate
    // feeding a HashAggregate keyed on (doc_id, dl, term)
    assert(!p.contains("HashAggregate(keys=[doc_id"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q246 RRF: both ranker windows keyed on query_id — never a " +
      "single-partition window") {
    val p = plan("q246_rrf_fusion")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("q248 budget fill: bucket-prefix frame broadcasts; the scan reads " +
      "only the needed columns") {
    val p = plan("q248_token_budget_fill")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("n_chars"), p) // pruned ReadSchema
    assert(!p.contains("lang"), p)
  }

  test("q250 training mix: budget fill on the keyed PrefixScan (final " +
      "stage is the scan output, no window); no cartesian anywhere") {
    // the shares-broadcast join sits UPSTREAM of the keyed scan
    // (fillByShare joins before range-sorting); since round 11 the
    // scan is a plan-visible PrefixScan node, so the whole pipeline —
    // including the DoReMi share windows the old RDD boundary HID —
    // shows in ONE plan. Those windows ride the per-source aggregate
    // (#sources rows, domain-bounded), which the low-card sweep's
    // child-aggregate exemption already vets for the whole inventory;
    // here we pin what the fill path itself must use: the ranks and the
    // running token total come from the ONE PrefixScan node (count+sum
    // monoids in one pass), never a window over the documents frame.
    val p = plan("q250_training_mix")
    assert(p.contains("PrefixScan [source"), p)
    assert(p.contains("[count, sum]"), p) // one scan, both monoids
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q251 trained-codebook IVF: codebook and probe cells broadcast") {
    val p = plan("q251_ann_ivf_kmeans")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q253 TPC-H Q18: qualifier set broadcasts, top-100 plans " +
      "TakeOrderedAndProject (no global sort)") {
    val p = plan("q253_tpch_q18")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), p)
  }

  test("q255 TPC-H Q21 shape: one lineitem aggregate (no self-joins), " +
      "supplier dim broadcasts, bounded top-k") {
    val p = plan("q255_tpch_q21")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // lineitem is scanned ONCE — the exists/not-exists collapse
    assert("FileScan parquet".r.findAllIn(p).count(_ => true) <= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q256 link prediction: wedge joins keyed on node ids, no " +
      "cartesian product, bounded top-k output") {
    val p = plan("q256_link_prediction")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q257 Spearman: ranks from the distinct-value count frame via the " +
      "keyed PrefixScan — no window, no single-partition stage") {
    val p = plan("q257_spearman")
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("PrefixScan"), p) // the keyed-scan rank frames
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q258 Kneser-Ney: the type-count scalar broadcasts; marginal " +
      "joins are keyed, no cartesian product") {
    val p = plan("q258_kneser_ney")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q259 incremental near-dup: asymmetric index probe — the corpus " +
      "documents are scanned once for band keys, never re-read") {
    val p = plan("q259_incremental_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q260 Kaplan-Meier: keyed windows and bounded per-segment curve " +
      "arrays — no single-partition window, no UDF in the fold") {
    val p = plan("q260_kaplan_meier")
    // every window spec is keyed on segment (the only SinglePartition
    // exchange is the deliberate 1-row dmax scalar broadcast)
    assert(p.contains("windowspecdefinition(segment"), p)
    assert(!"windowspecdefinition\\((?!segment)".r.findFirstIn(p).isDefined, p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q261 readability: map-only — no exchange, no join, no window") {
    val p = plan("q261_readability")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("q262 PPMI: marginals join the distinct-pair frame (not the " +
      "occurrence stream); total broadcasts; bounded top-k") {
    val p = plan("q262_ppmi")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q272-q274 eval reports: keyed joins and broadcasts only, no " +
      "cartesian products, no UDFs") {
    for (q <- Seq("q272_ngram_novelty", "q273_blocking_quality",
        "q274_label_noise")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
    }
  }

  test("q269 PIT join: versions probe is an equi-join on user_id (no " +
      "range shuffle), keyed windows only") {
    val p = plan("q269_pit_join")
    assert(p.contains("windowspecdefinition(user_id"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!"Exchange rangepartitioning".r.findFirstIn(p).isDefined, p)
  }

  test("q271 Dirichlet QL: one scan, stats broadcast, bounded top-k") {
    val p = plan("q271_dirichlet_ql")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Generate"), p) // tf comes off the token array, no explode
  }

  test("q267 Holt and q268 DTW: folds run in HOF expressions over " +
      "bounded per-series arrays — no UDF, no cartesian beyond the " +
      "series-pair grid") {
    for (q <- Seq("q267_holt_forecast", "q268_dtw")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
      assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
        s"$q: $p")
    }
  }

  test("q265 Theil-Sen: pair pool is keyed per series; median rank " +
      "windows are keyed too — no single-partition window") {
    val p = plan("q265_theil_sen")
    assert(p.contains("windowspecdefinition(event_type"), p)
    assert(!"windowspecdefinition\\((?!event_type)".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q266 incremental embedding dedup: bucket-keyed probe join, no " +
      "cartesian product outside the 8-plane broadcast") {
    val p = plan("q266_incremental_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q264 isotonic: distributed work is the bucket aggregate; the " +
      "PAV minimax runs in HOF expressions over the bounded bucket " +
      "array, not a UDF") {
    val p = plan("q264_isotonic_calibration")
    assert(!p.toLowerCase.contains("scalaudf"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q263 PQ: codebooks and per-query lookup tables broadcast onto " +
      "the code stream; no cartesian product, no UDF") {
    val p = plan("q263_product_quantization")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q275 pass@k: one groupBy(user) with partial aggregation; the " +
      "product estimator is a codegen expression, no UDF, no window") {
    val p = plan("q275_pass_at_k")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q276 conformal: the order statistic rides the keyed PrefixScan " +
      "(no window); pred and q-hat dims broadcast onto the test split") {
    val p = plan("q276_conformal")
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("PrefixScan"), p) // the keyed-scan rank frame
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q277 BLEU pairs: keyed lead() pairing, n-gram counting is " +
      "explode + keyed groupBy — no cartesian, no global window") {
    val p = plan("q277_bleu_pairs")
    assert(p.contains("windowspecdefinition(source"), p)
    assert(!"windowspecdefinition\\((?!source)".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q278 JSD: token counts are keyed groupBys; only the tiny " +
      "per-source totals cross-join (broadcast), terms sum as integers") {
    val p = plan("q278_js_divergence")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q279 Q5 / q282 Q8: nation/region/part dims broadcast; date " +
      "filters push into the fact scans; no cartesian product") {
    for (q <- Seq("q279_tpch_q5", "q282_tpch_q8")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: $p")
      assert(p.contains("PushedFilters: [IsNotNull"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q280 Q10: returnflag + date filters push down; top-20 plans " +
      "TakeOrderedAndProject, never a global sort") {
    val p = plan("q280_tpch_q10")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q281 Q16: part filter and supplier denylist broadcast; distinct " +
      "suppliers shuffle once on the group key") {
    val p = plan("q281_tpch_q16")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q283 Q4: the EXISTS runs as a LEFT SEMI equi-join with a " +
      "residual date condition — no duplication, no distinct") {
    val p = plan("q283_tpch_q4")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q284 winnowing: fingerprint selection is map-side HOFs; the " +
      "shuffles are the fp groupBy and one keyed join — no cartesian, " +
      "no UDF, no window") {
    val p = plan("q284_winnowing")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
    assert(!p.contains("Window"), p)
  }

  test("q285 vocab richness: two keyed aggregates with partial " +
      "aggregation, nothing global") {
    val p = plan("q285_vocab_richness")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q286 Mann-Whitney / q287 KS: rank windows run on the bounded " +
      "distinct-value frame, keyed per event_type — no global window, " +
      "no cartesian") {
    for (q <- Seq("q286_mann_whitney", "q287_ks_test")) {
      val p = plan(q)
      assert(p.contains("windowspecdefinition(event_type"), s"$q: $p")
      assert(!"windowspecdefinition\\((?!event_type)".r.findFirstIn(p).isDefined,
        s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q288 PSI / q289 DP release: one keyed aggregate each; PSI's " +
      "grid join broadcasts the totals; noise/terms are codegen " +
      "expressions, no UDF") {
    for (q <- Seq("q288_psi", "q289_dp_release")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(p.contains("HashAggregate"), s"$q: $p")
    }
  }

  test("q290 geo kNN: anchors broadcast onto one linear point scan; " +
      "top-3 per anchor runs the bounded-heap operator, no window, " +
      "no sort of the candidate stream") {
    val p = plan("q290_geo_knn")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q291 interval union / q292 Markov: windows keyed by user_id " +
      "only; the Markov iteration joins the tiny state frame") {
    for (q <- Seq("q291_interval_union", "q292_markov_stationary")) {
      val p = plan(q)
      assert(p.contains("windowspecdefinition(user_id"), s"$q: $p")
      assert(!"windowspecdefinition\\((?!user_id)".r.findFirstIn(p).isDefined,
        s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q293 decile lift: ranking is the range-sort zipWithIndex path; " +
      "the only window runs on the 10-row decile frame") {
    val p = plan("q293_decile_lift")
    assert(!p.contains("windowspecdefinition(score"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q294 clustering coefficient: wedge joins key on node ids, " +
      "closure probe on the canonical pair — no cartesian, no UDF") {
    val p = plan("q294_clustering_coeff")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q295 BFS / q296 Heaps: hop joins key on node id, firsts are a " +
      "keyed min aggregate — no cartesian, no UDF, no global window " +
      "beyond the 10-row curve cumsum") {
    for (q <- Seq("q295_khop_bfs", "q296_heaps_law")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
    }
  }

  test("q297 skyline / q298 global cumsum: the running aggregate is the " +
      "two-phase PrefixScan — NO window operator in the plan at all") {
    for (q <- Seq("q297_skyline", "q298_cumsum_scalable")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q299 entity resolution: no cartesian, no UDF — the CC stage is " +
      "checkpointed (its JW/block-join plan is q217's, asserted there)") {
    val p = plan("q299_entity_resolution")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("q315 median-of-means / q316 modularity: keyed aggregates with " +
      "partial aggregation; bounded bucket arrays / 1-row m broadcast") {
    for (q <- Seq("q315_median_of_means", "q316_modularity")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
    }
  }

  test("q313 RAKE: segmentation is a keyed per-doc running count; " +
      "word stats are key aggregates; top-20 plans TakeOrdered") {
    val p = plan("q313_rake")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("windowspecdefinition(doc_id"), p)
    assert(!"windowspecdefinition\\((?!doc_id)".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q314 grouping sets: one Expand + hash aggregate, no join") {
    val p = plan("q314_grouping_sets")
    assert(p.contains("Expand"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("q311 PSM: matching is two keyed ignore-nulls neighbor windows " +
      "per event_type — no pairwise product, no global window") {
    val p = plan("q311_psm_att")
    assert(p.contains("windowspecdefinition(event_type"), p)
    assert(!"windowspecdefinition\\((?!event_type)".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q312 windowFunnel: per-user fold over the sorted own-event list " +
      "— one keyed aggregate, no UDF, no join") {
    val p = plan("q312_window_funnel")
    assert(!p.toLowerCase.contains("scalaudf"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate") ||
      p.contains("HashAggregate"), p)
  }

  test("q310 Q6: all predicates push into the single scan — no join, " +
      "no shuffle beyond the final 1-row aggregate") {
    val p = plan("q310_tpch_q6")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(!p.contains("Join"), p)
  }

  test("q305 Q19 / q309 Q14: part dim broadcasts, the disjunctive / " +
      "CASE predicates stay post-join residuals — no cartesian") {
    for (q <- Seq("q305_tpch_q19", "q309_tpch_q14")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q306 Q22 / q307 Q15: scalar thresholds ride 1-row broadcasts; " +
      "Q22's no-orders test is a broadcast anti join") {
    val p6 = plan("q306_tpch_q22")
    assert(p6.contains("LeftAnti"), p6)
    assert(p6.contains("BroadcastHashJoin") ||
      p6.contains("BroadcastNestedLoopJoin"), p6)
    val p7 = plan("q307_tpch_q15")
    assert(!p7.contains("CartesianProduct") ||
      p7.contains("BroadcastNestedLoopJoin"), p7)
  }

  test("q308 Q13: left outer keeps zero-order customers; two-level " +
      "aggregate with partial aggregation") {
    val p = plan("q308_tpch_q13")
    assert(p.contains("LeftOuter"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q302 winnow matches: pair space confined to capped fingerprint " +
      "buckets — no cartesian, no UDF, no window") {
    val p = plan("q302_winnow_matches")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
    assert(!p.contains("Window"), p)
  }

  test("q303 HITS / q304 corrupt JSON: iteration joins key on node id / " +
      "single-scan aggregate — no cartesian beyond 1-row max broadcasts") {
    for (q <- Seq("q303_hits", "q304_corrupt_json")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.toLowerCase.contains("scalaudf"), s"$q: $p")
    }
  }

  test("q300 rolling slope / q301 DoW profile: keyed windows/aggregates " +
      "only, totals broadcast — no global window, no cartesian") {
    val p300 = plan("q300_rolling_slope")
    assert(p300.contains("windowspecdefinition(c#"), p300)
    assert(!"windowspecdefinition\\((?!c#)".r.findFirstIn(p300).isDefined, p300)
    val p301 = plan("q301_dow_seasonality")
    assert(!p301.contains("Window"), p301)
    assert(p301.contains("BroadcastHashJoin"), p301)
    assert(!p301.contains("SortMergeJoin"), p301)
  }

  test("q71/q176 global cumulative/quintile scores plan NO Window at all") {
    // both ride the two-phase distributed scan/rank (PrefixScan /
    // Ranking.globalRank); a Window node here would mean the
    // single-partition global-order form crept back in
    for (q <- Seq("q71_wealth_percentile", "q176_rfm")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q: $p")
    }
  }

  test("q248 budget fill: only KEYED windows remain (bucket prefix is a " +
      "distributed PrefixScan)") {
    val p = plan("q248_token_budget_fill")
    assert(p.contains("windowspecdefinition(bkt#"), p)
    assert(!"windowspecdefinition\\((?!bkt#)".r.findFirstIn(p).isDefined, p)
  }

  test("q343 stupid backoff: keyed equi-joins only — no cartesian beyond " +
      "the 1-row total, no UDF") {
    val p = plan("q343_stupid_backoff")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q344 hashed-bag scores: weight dim broadcasts, no global window") {
    val p = plan("q344_hashed_bag_score")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q347/q348 in-cell pair joins key on the cell — no cartesian") {
    for (q <- Seq("q347_mutual_nn_scaled", "q348_hard_negatives")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"$q: $p")
    }
  }

  test("q355/q356 phash band joins key on (band, key) — no cartesian; " +
      "the pair stage is an equi-join") {
    for (q <- Seq("q355_phash_neardup", "q356_phash_scaled")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"$q: $p")
    }
  }

  test("round-8 additions: no CartesianProduct anywhere in q350-q378") {
    val qs = SparkEntry.queries.keys.filter { n =>
      val id = n.drop(1).takeWhile(_.isDigit).toInt
      id >= 350 && id <= 378
    }
    assert(qs.size >= 25, s"expected the round-8 block, got: $qs")
    for (q <- qs) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("q331 negative-sampling probe is a hash join on the cell id, " +
      "not a nested-loop range probe") {
    val p = plan("q331_negative_sampling")
    // the probe: equi-join on the fixed-stride cell with the range check
    // as a post-condition of the HASH join
    assert("BroadcastHashJoin \\[cell#".r.findFirstIn(p).isDefined, p)
    // no nested-loop carries the range predicate (the only allowed BNLJ
    // is the 1-row wtot scalar cross join)
    assert(!"BroadcastNestedLoopJoin [^\\n]*>=".r.findFirstIn(p).isDefined, p)
  }

  test("no global (empty-PARTITION-BY) window anywhere in the full " +
      "query inventory, outside the documented allowlist") {
    // A Window with an empty partitionSpec funnels the WHOLE frame
    // through one task — the scale-killer class found in q71/q176/q248
    // (round 7) and q390 (round 8), each time by a human reading one
    // plan. This sweep turns that audit into a regression test over
    // every query's physical plan. Allowlist:
    //  - q17_global_rank, q39_local_rank_join: reference-parity window
    //    forms, kept deliberately (scalable twins: Ranking.globalRank,
    //    q91/q150; SURVEY §7.3 documents the divergence);
    //  - the rest are global windows over BOUNDED aggregate frames
    //    (never the data-sized input): q322 ≤25 rows, q337 20
    //    threshold buckets, q293/q296 10 decile/doc buckets,
    //    q264 ~21 score buckets, q249/q250/q386 #sources rows
    //    (Mixture.doremiShares/unimaxAllocation), q388 #strata rows,
    //    q392 #variants×#states rows, q303 ≤300 graph nodes (its
    //    scaladoc records the measured 2× cost of the window-free
    //    form). The first data-sized hit this sweep found — q78's
    //    whole-table ntile — was FIXED (Ranking.globalRank +
    //    ntile-from-rank), not allowlisted.
    val allow = Set("q17_global_rank", "q39_local_rank_join",
      "q322_quota_split", "q337_roc_points", "q293_decile_lift",
      "q296_heaps_law", "q264_isotonic_calibration",
      "q249_doremi_mixture", "q250_training_mix", "q386_unimax_mix",
      "q388_neyman_allocation", "q392_removal_attribution", "q303_hits")
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // sparkPlan (pre-AQE) so the tree walk sees every operator
      val globals = fn(spark, sf).queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
      }
      if (globals.nonEmpty && !allow(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"global-window offenders: ${offenders.mkString(", ")}")
  }

  test("no low-cardinality keyed window over a data-sized frame " +
      "anywhere in the full query inventory, outside the allowlist") {
    // The class the empty-PARTITION sweep misses: a WindowExec whose
    // partition keys are ALL drawn from the fixture's bounded-
    // cardinality columns (3-10 distinct values) runs with parallelism
    // = #distinct keys — at 100x, 3-10 tasks each hold the whole
    // frame's slice. Round-10 found-and-fixed instances: q257 (rank
    // over flag), q276 (row_number over event_type), q222 (row_number
    // over label), q329 (lag over event_type), q525 (lag over
    // event_type), Mixture.fillByShare (row_number+sum over source) —
    // the verdict's five — plus four THIS SWEEP found on first run:
    // q106 (cumsum over lang), q20 (avg/stddev over event_type →
    // groupBy+broadcast join-back), q254 (row_number over event_type),
    // q388 (md5-draw row_number over event_type) — all rewritten onto
    // PrefixScan.scanLongKeyed/lagLongKeyed.
    // Exemptions, checked structurally:
    //  - an AGGREGATE anywhere below the window: the frame is then a
    //    group-domain aggregate, not the raw data (the repo convention:
    //    keyed windows over domain-bounded frames are fine);
    //  - a WindowGroupLimitExec below with the same keys: Spark's
    //    rank<=literal rescue bounds each task's work to k rows.
    // Allowlist (each audited by hand):
    //  - (currently empty — every hit was fixed, not allowlisted).
    val lowCard = Set("source", "event_type", "flag", "label", "lang",
      "half", "l_returnflag", "l_linestatus")
    val allow = Set.empty[String]
    def attrNames(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
        : Option[Set[String]] = {
      val names = es.map {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          Some(a.name.toLowerCase)
        case _ => None
      }
      if (names.forall(_.isDefined)) Some(names.flatten.toSet) else None
    }
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // earlier queries' persist() would otherwise substitute cached
      // InMemoryTableScans for aggregate subtrees, hiding them from the
      // child-aggregate exemption below (found: q395 false-flagged)
      spark.catalog.clearCache()
      val p = fn(spark, sf).queryExecution.sparkPlan
      val hits = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.filter { w =>
        attrNames(w.partitionSpec) match {
          case Some(keys) if keys.nonEmpty && keys.subsetOf(lowCard) =>
            val hasAgg = w.child.collectFirst {
              case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
            }.isDefined
            val rescued = w.child.collectFirst {
              case g: org.apache.spark.sql.execution.window.WindowGroupLimitExec
                  if attrNames(g.partitionSpec) == Some(keys) => g
            }.isDefined
            !hasAgg && !rescued
          case _ => false
        }
      }
      if (hits.nonEmpty && !allow(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"low-card keyed-window offenders: ${offenders.mkString(", ")}")
  }

  test("no collect_list/collect_set grouped by a low-cardinality (or " +
      "empty) key over a data-sized frame, outside the allowlist") {
    // The sibling of the keyed-window hazard: sum/count aggregates
    // partial-combine map-side, but collect_list/set state is the GROUP
    // ITSELF — grouped by a 3-10-value key (or nothing) over raw data,
    // the final merge concentrates whole-table slices in #keys tasks.
    // The repo convention allows bounded float folds
    // (array_sort(collect_list)+aggregate) only over DOMAIN-BOUNDED
    // frames — which in every legitimate site means the collect's child
    // contains an upstream aggregate; this sweep enforces exactly that.
    val lowCard = Set("source", "event_type", "flag", "label", "lang",
      "half", "l_returnflag", "l_linestatus")
    val allow = Set.empty[String]
    def isCollect(
        a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec) =
      a.aggregateExpressions.exists { ae =>
        ae.aggregateFunction.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.aggregate.CollectList] ||
        ae.aggregateFunction.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.aggregate.CollectSet]
      }
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      spark.catalog.clearCache() // see the keyed-window sweep above
      val p = fn(spark, sf).queryExecution.sparkPlan
      val hits = p.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if isCollect(a) => a
      }.filter { a =>
        val keys = a.groupingExpressions.map {
          case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
            Some(ar.name.toLowerCase)
          case _ => None
        }
        val allAttrs = keys.forall(_.isDefined)
        val names = keys.flatten.toSet
        val lowOrGlobal = names.isEmpty || (allAttrs && names.subsetOf(lowCard))
        val hasAgg = a.child.collectFirst {
          case c: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => c
        }.isDefined
        lowOrGlobal && !hasAgg
      }
      if (hits.nonEmpty && !allow(name)) offenders += name
    }
    assert(offenders.isEmpty,
      s"low-card keyed-collect offenders: ${offenders.mkString(", ")}")
  }

  test("q546 hot-key split join: the hot slice rides a broadcast join, " +
      "nothing is replicated") {
    val p = plan("q546_hot_split_join")
    assert(p.contains("BroadcastHashJoin"), p) // the hot slice
    assert(p.contains("Union"), p) // cold ∪ hot — the split happened
    assert(!p.contains("Generate"), p) // no salt replication anywhere
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q547 span excision: anti-join shape, skew-safe aggregate + " +
      "shuffled-hash join-back, no window, no cached state") {
    val p = plan("q547_substr_excise")
    assert(p.contains("LeftAnti"), p) // token excision is an anti-join
    // canonical occurrence + duplicate count come from a two-phase hash
    // aggregate keyed on BOTH 60-bit halves of the span digest (map-side
    // partials collapse a hot boilerplate span to one row per map task)
    assert("partial_min\\(struct\\(".r.findFirstIn(p).nonEmpty, p)
    // ... joined back with a shuffled-HASH join: the skewed occurrence
    // side STREAMS (and AQE skew-split covers SHJ). A Window here would
    // colocate every occurrence of a hot span into one unsplittable sort
    // task — the round-13 shape, retired by the round-14 skew fixture.
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // r15: the q547 call site opts into the occurrence-stream persist
    // (occStorage), so the tokenize+shingle+md5 pass is ONE cached scan
    // read by both the aggregate and the probe branch; the harness
    // clearCache releases it (the exciseKept storage contract). The
    // stateless default path's zero-storage guarantee is pinned in
    // DedupSpec.
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("every keyed-scan consumer plans the PrefixScan physical node " +
      "(the round-11 promotion, pinned as a sweep)") {
    // the operator is plan-visible since round 11 — if a consumer ever
    // regresses to a window or an RDD boundary, this sweep catches it
    val consumers = Seq("q106_packing", "q222_class_balance",
      "q250_training_mix", "q254_quantile_transform", "q257_spearman",
      "q276_conformal", "q329_delta_encoding", "q388_neyman_allocation",
      "q525_g_chart", "q543_max_drawdown", "q544_record_highs",
      "q545_burst_islands")
    val missing = consumers.filterNot { q =>
      spark.catalog.clearCache()
      plan(q).contains("PrefixScan")
    }
    assert(missing.isEmpty, s"no PrefixScan node in: ${missing.mkString(", ")}")
  }

  test("no CartesianProduct anywhere in the full query inventory") {
    // Consolidates the per-round block sweeps (q350-q378 etc.) into the
    // whole-inventory invariant: scalar cross joins ride broadcast
    // nested loops (1-row frames), every pair construction is celled /
    // banded / keyed — a true cartesian never survives review.
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      spark.catalog.clearCache()
      val n = fn(spark, sf).queryExecution.sparkPlan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.size
      if (n > 0) offenders += name
    }
    assert(offenders.isEmpty,
      s"cartesian offenders: ${offenders.mkString(", ")}")
  }
}
