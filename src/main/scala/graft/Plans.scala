package graft

import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans for representative queries into
  * PLANS.md — the plan-quality evidence (pushdown, pruning, broadcast,
  * codegen) behind the scale claims. `sbt "runMain graft.Plans"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val picks = Seq(
      "ws_q1_and"   -> "index-path boolean AND (batched plan-time lookup; candidates compiled to one IN predicate on the event scan — single job, zero exchanges)",
      "ws_q6_suffix" -> "leading wildcard over the PERSISTED reverse index (StartsWith pushed to the scan)",
      "q3_top_orders" -> "broadcast dim + fact-fact shuffle join + top-k",
      "q2_filter_pushdown" -> "raw parquet scan with pushed filters",
      "dd_minhash_lsh" -> "MinHash LSH band join",
      "dd_incr" -> "incremental LSH dedup: fresh band rows probe the corpus band table; corpus-corpus pairs never formed",
      "dd_dup_spans" -> "cross-doc repeated spans: window-hash df agg + flagging join, no pairwise blow-up",
      "sim_pairs_brute" -> "block-nested-loop exact all-pairs (no driver collect, keyed block-pair shuffle)",
      "sim_topk" -> "broadcast query set + window top-k",
      "sim_lsh_multi" -> "multi-table hyperplane LSH: one projection pass, bucket self-join, exact rerank",
      "cu_contam" -> "decontamination: broadcast semi-join on eval shingle hashes, no corpus shuffle",
      "cu_bloom" -> "bloom-prefiltered decontamination: scan-side mightContain prune, keyed exact-verify semi-join on the ~fpp survivors only",
      "cu_pack" -> "context packing: distributed prefix-scan (pid-keyed window, no single-partition global sort)",
      "q24_asof_join" -> "AS-OF join as union-tag + one window pass: both sides shuffle once on user_id, no per-partner explosion",
      "q25_range_join" -> "no-equi-key interval join bucketized to a bucket equi-join (two probes per row, then exact range prune)",
      "ws_bm25" -> "BM25 ranked retrieval, postings-only: dl rides on the posting row, (N, avgdl) are driver-folded literals — one pushed term-IN postings scan + broadcast df join + hit-set groupBy; NO corpus-sized join, NO documents-table scan anywhere in the plan",
      "cu_quality_gate" -> "exact corpus-quantile threshold from a bounded integer-permille histogram (no global sort), broadcast back",
      "sim_pq_topk" -> "PQ ANN: ADC over m-byte codes with broadcast query tables, exact rerank of the shortlist only",
      "sim_ivfpq_topk" -> "IVF-PQ: probed cells prune candidates, codes cheapen the scan, exact rerank on the shortlist",
      "ws_msnip" -> "multi-term snippets: postings-driven hits aggregated per doc BEFORE the content join (one tokenize per doc)",
      "ws_psnip" -> "phrase snippets: adjacency via intersection of shifted stored-offset arrays, then co-partitioned content join",
      "q27_cube" -> "CUBE over all grouping sets: Expand (4 replicas) into ONE partial-aggregable hash agg — a single shuffle for all levels",
      "q29_distinct_window" -> "running DISTINCT count: collect_set over a RANGE frame — one shuffle on user_id, no self-join",
      "dd_keep_best" -> "canonical selection over near-dup clusters: struct-argmax aggregation (partial-aggregable, no per-component window sort)",
      "q30_quantile_cont" -> "PERCENTILE_CONT: histogram-bracketed two-pass selection — driver-local bucket catalog, fact table filtered to the bracketing buckets via ONE broadcast join, window only over bucket slices (never the fact table)",
      "ta_top_ngrams" -> "boilerplate mining: shingle df agg (map-side combined) + TakeOrderedAndProject top-k",
      "ws_fuzzy" -> "typo-tolerant lookup: ONE vocabulary-sized postings agg, codegen'd deletion-neighborhood explode, broadcast join + exact levenshtein verify",
      "ta_lm_score" -> "LM-familiarity filter: trigram df agg (map-side combined) + equi-join back on the SAME shingle key, broadcast corpus count",
      "q31_grouping_sets" -> "explicit GROUPING SETS: Expand (2 replicas, only the requested levels) into ONE partial-aggregable hash agg",
      "ws_near_q" -> "f:near composed in the query language: OR-of-EQ candidates intersect the stored-offset proximity join exactly (NearLeaf, never the min-card superset rule)",
      "ws_fuzzy_q" -> "f:fuzzy composed in the query language: SymSpell vocabulary expansion becomes a multi-form EQ leaf driving candidates; the residual re-verifies with the exact levenshtein predicate",
      "ws_phrase_q" -> "f:phrase composed in the query language: ordered adjacency from intersected shifted stored-offset arrays (shared with ws_psnip), intersected exactly with the EQ-driven candidates",
      "ws_knear_q" -> "k-term f:near: n-way co-partitioned stored-offset postings join, one codegen'd window predicate (exists-start covering every term), intersected exactly with EQ-driven candidates",
      "ws_onear_q" -> "ordered f:onear: the same n-way postings join with a chained strictly-increasing window predicate (SpanNear-in-order)",
      "ws_fuzzy2_q" -> "distance-2 f:fuzzy: nested SymSpell deletion neighborhoods expand the vocabulary candidates; residual re-verifies with threshold levenshtein at d=2",
      "ws_index_incremental" -> "incremental index maintenance: base+delta fragments folded through ONE co-keyed UidList merge aggregation (merge-on-read — the delta-based maintainer's read path)",
      "ws_page_q" -> "keyset pagination: the boundary predicate filters BEFORE a bounded TakeOrderedAndProject — page N costs page 1, no OFFSET skip-sort, no window; both BM25 passes read materialized doc_lengths/corpus_stats",
      "ws_count_q" -> "count-only serving, index-only fast path: the count is resolved from plan-time postings, so the PLAN is a one-row LocalRelation — the event store is never in it",
      "cu_temp" -> "temperature-balanced sampling: bounded per-source quota aggregate, then ONE codegen'd narrow filter (hash gate) over the corpus — no join, no shuffle on the data path",
      "cu_budget" -> "per-source token budget: distributed prefix-scan on monotone hash buckets — per-(source,bucket) token totals, below-bucket window over bounded rows, one boundary bucket sorts ~1/buckets of its source; no per-source global sort",
      "sim_ivf_filtered" -> "filtered ANN: the allowed-set semi-join pre-filters the corpus BEFORE scoring, composed with probed-cell pruning — the rerank set shrinks with predicate selectivity, never post-filtered ranked results",
      "ws_infix_q" -> "trigram-accelerated opaque regex: gram IN-list probe of the gram-sorted vocabulary projection + exact plan-time verify plans each infix pattern as a multi-form EQ leaf — the event store is reached only through the candidate IN predicate, never full-scanned",
      "ws_mlt_q" -> "more-like-this: source terms broadcast into the postings filter, integer rarity-weighted sum per candidate with N as a driver-cached corpus-stats literal (no documents-table count), bounded TakeOrderedAndProject — no window",
      "ws_hist_q" -> "hit-set histogram: one narrow projection over the residual-verified hits, exact integer-parameter bucketing, <=buckets-row aggregation",
      "q33_rank_family" -> "five rank functions over ONE shared window spec: a single Window operator — one shuffle + one sort serve rank/dense_rank/ntile/percent_rank/cume_dist together",
      "ws_hybrid" -> "hybrid retrieval: two bounded top-50 pages (TakeOrdered BM25 + broadcast-query cosine) full-outer-joined on id; the RRF fold and final rank cover <=100 rows — nothing corpus-scaled",
      "sim_knn" -> "k-NN classification: exact top-k neighbors (broadcast queries) + label equi-join + per-query argmax over <=k rows; the neighbor source swaps to IVF at scale",
      "q34_kmv_distinct" -> "KMV distinct sketch: <=k-doubles mergeable partial-agg state, map-side combined — vs countDistinct shuffling every distinct value",
      "ws_collapse_q" -> "field collapsing: argmin+count groupBy over the hit set — map-side combined, no window, no per-group sort",
      "ws_stats_q" -> "index catalog statistics: one partial-aggregable pass over the postings store, keyed on the bounded language domain — the batch ANALYZE surface",
      "ta_nb_langid" -> "trained NB classifier: vocabulary-x-labels model broadcast into a token join, one keyed integer sum per (doc,label), per-doc argmax — quantized log-likelihoods make inference exact integer arithmetic",
      "q35_gapfill" -> "time-series gap-fill: dense hour-x-type grid exploded from ONE aggregate row, left join to observed counts — grid cost corpus-independent",
      "ws_complete_q" -> "prefix autocomplete: StringStartsWith pushed to the value-sorted global-index scan (the forward twin of the reverse-index suffix probe) + bounded TakeOrderedAndProject",
      "sim_range" -> "radius similarity search: broadcast queries x streamed corpus + ONE codegen'd threshold filter — no window, no global sort, no task holds more than its input split",
      "q36_cms_heavy" -> "count-min heavy hitters: ObjectHashAggregate whose partial state is the d*w counter matrix (map-side combined, nothing key-shaped shuffles); the one-row sketch is driver-collected closure state (16 KB, a sketch constant), and the exact witness aggregates only the candidate-gated semi-join — no corpus-keyed count table, no per-row sketch array",
      "q37_bottomk_quantile" -> "bottom-k sampled quantiles: ObjectHashAggregate with <=k (hash,value)-pair mergeable state per group (map-side combined) — the quantile companion to q34/q36; no global sort, no window, nothing corpus-sized shuffles",
      "cu_chunk" -> "sliding-window chunking: tokenize -> sequence/explode window starts -> slice+rejoin, ONE narrow codegen span over the documents scan — no shuffle anywhere",
      "cu_dsir" -> "DSIR importance selection: one exploded-corpus pass builds the (token, raw, target) count table (target rides as a conditional sum — the target subset is never re-scanned), model joins broadcast (size-dialed), per-doc integer sum, bounded TakeOrderedAndProject top-200",
      "sim_rp" -> "random projection top-k: compiled projection pass + broadcast projected queries; BOTH cosines (projected ranking key + true-cosine witness) computed in one scored join over (embedding, rp) pairs — no second corpus join, dots codegen'd in both spaces",
      "sim_mmr" -> "MMR diversified top-k: exact bounded pool (broadcast queries x streamed corpus, WindowGroupLimit top-pool) then the sequential greedy INSIDE the per-query aggregation row (collect_list over <=pool rows + one UDF explode) — never a driver loop, greedy cost bounded by the pool, not the corpus",
      "cu_wsample" -> "Efraimidis-Spirakis weighted sampling: one narrow codegen'd key projection (hash + ln + quantize) over the scan into a bounded TakeOrderedAndProject — no shuffle beyond the top-n merge",
      "cu_live_dsir" -> "live DSIR model serving: the merged count table is ONE distributed keyed sum over the union of committed deltas (merge-on-read — no corpus re-scan anywhere in the plan), the quantized model derives model-sized frames, scoring joins it broadcast",
      "sim_mmr_ivf" -> "IVF-pooled MMR: the candidate pool comes from ivfScored's probe-join-score — a cell-key join between the cached (vec, cell) assignment and each query's nprobe probed cells, so only nprobe/cells of the corpus is scored per query (cell-partitioned PartitionFilters on the saved-index serving path), embedding carried through to the SAME per-query greedy as sim_mmr; the brute broadcast-x-corpus pool stage is gone from the plan",
      "sim_live_asof" -> "live ANN time travel: the version-1 read set's parquet union (v0+v1 only — later deltas and tombstones absent from the SCAN, not filtered out of it) probe-joined and scored exactly like sim_ivf_topk; snapshot isolation is path selection, zero extra plan nodes",
      "cu_dsir_oov" -> "DSIR OOV scoring: occurrence table LEFT-joins the broadcast half-corpus model with coalesce(lr, floor) — same keyed integer fold as cu_dsir, the floor a plan-time literal from one model-sized aggregate; no extra corpus pass for the OOV branch")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by graft.Plans at sf0.01)\n\n")
    sb.append("What to look for: `PushedFilters` on index/fact scans, ")
    sb.append("`dynamicpruningexpression` partition pruning on the shard fallback, ")
    sb.append("`BroadcastHashJoin` for dims/candidates, `*(n)` whole-stage-codegen spans.\n")
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep the operator tree + scan details; drop the long column lists
      val trimmed = plan.linesIterator
        .takeWhile(l => !l.startsWith("== Photon")) // no-op guard
        .filter(l => l.nonEmpty)
        .take(400).mkString("\n")
      sb.append(s"\n## $name — $why\n\n```\n$trimmed\n```\n")
    }

    // Serving path (QueryService.query applies `limit` on the engine's
    // DataFrame BEFORE collect): show the limit lands in the physical
    // plan as CollectLimit — rows beyond it are never materialized.
    val eng = search.SearchQueries.engine(spark, dir)
    val served = eng.run("TEXT == 'spark' and TEXT == 'join'").limit(10)
    val servedPlan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.nonEmpty).take(120).mkString("\n")
    sb.append("\n## serving path — QueryService.query(limit=10): " +
      "limit executes as CollectLimit inside the plan, not driver-side truncation\n\n")
    sb.append(s"```\n$servedPlan\n```\n")

    // Ranked serving (QueryService.rank → engine.rankTopK): the top-k is
    // a bounded TakeOrderedAndProject — per-partition top-k then a
    // k-row merge — NOT the full-ranking form's unpartitioned window
    // (which would move every hit through one task at corpus scale).
    val rankedPlan = eng.rankTopK(Seq("spark", "join"), 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.nonEmpty).take(120).mkString("\n")
    sb.append("\n## serving path — QueryService.rank(limit=10) via rankTopK: " +
      "TakeOrderedAndProject (bounded top-k), no unpartitioned WindowExec\n\n")
    sb.append(s"```\n$rankedPlan\n```\n")
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
