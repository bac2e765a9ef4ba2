package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture evidence (round-6 VERDICT #1): every 100×-scale claim in
  * SCALE.md rested on plan shapes; this main produces EXECUTION evidence
  * by synthesizing a key-remapped KX replica of sf0.1 (testdata is
  * read-only, so the replica lands under /tmp) and running the heaviest
  * queries at both scales. A healthy operator scales ≈ linearly (factor
  * ≈ K + constant overheads); anything super-linear is a named bug.
  *
  * Replica construction (per replica r of K):
  *  - documents: doc_id shifted into a disjoint id range; every WORD of
  *    the text gets a fixed-width per-replica suffix (`~07`) — injective
  *    for ANY K (a Caesar rotation would collide at r % 26 — round-7
  *    review fix), so cross-replica shingle/minhash/simhash overlap is
  *    exactly zero while WITHIN-replica duplicate structure (exact dups,
  *    planted near-dups, boilerplate) is preserved EXACTLY (same suffix
  *    on every word of a replica; word-level relations are invariant
  *    under an injective per-word map). The dedup workload grows K× in
  *    documents AND K× in duplicate clusters, which is the honest way to
  *    scale a dedup benchmark (plain replication would instead create
  *    K-way cross-replica dup cliques — quadratic pair growth by data
  *    construction, not by plan regression). The suffix is fixed-width,
  *    so every replica (including r=0) carries identical text lengths.
  *  - events: event_id/user_id shifted into disjoint ranges, everything
  *    else unchanged — 10× series of the SAME length, so per-key state
  *    (q_ewma windows, recurrence folds) stays constant and only
  *    parallelism grows, matching how a TSDB fleet actually scales.
  *
  * Usage: `sbt "runMain graft.ScaleBench [K]"` (default K=10). Prints one
  * JSON line per query with base/replica medians and the scaling factor,
  * then a summary line. SPARK_GRAFT_SCALE_DIR overrides the replica
  * location; an existing replica dir is reused (delete it to rebuild).
  */
object ScaleBench {

  /** The heaviest BENCH_r06 queries that read documents/events. */
  val heavy: Seq[String] = Seq(
    // round-11: cluster-size rollup — the components subtree + two
    // catalog-sized aggs, factor should track q_dedup_components
    "q_dedup_cluster_stats",
    "q_dedup_components", "q_dedup_apply", "q_dedup_jaccard_verify",
    "q_dedup_minhash_lsh", "q_dedup_simhash_pairs", "q_dedup_boilerplate",
    "q_dedup_substring", "bpe_train",
    "q_decontaminate_bloom", "q_text_repetition", "q_text_levenshtein",
    "q_text_levenshtein_blocked",
    "q_ewma", "q_ewma_recurrence", "q32_json_funcs",
    "q_ingest_typed", "q_ingest_generator", "q_approx_quantiles",
    // round-10 additions: keep-best rides the CC subtree + a
    // cluster-sized window; source-cap is one source-key window; cross-
    // dedup's NEW side is doc_id%10==3, so the replica construction
    // grows the batch K× along with the corpus — the factor reads as
    // "batch and corpus both ×K", an upper bound on the fixed-size-batch
    // serving shape.
    "q_dedup_keep_best", "q_dedup_cross", "q_source_cap",
    // round-8 addition: one profiling scan per table (documents AND
    // events) — n-way exact distinct plans as Expand(×cols); output is
    // catalog-sized whatever K, so the factor reads the Expand cost
    "q_profile_columns",
    // round-8: the composite cleaning pipeline as one plan — the
    // end-to-end number (blocklist + quality + dedup + decontaminate)
    "q_pipeline_clean",
    // round-8: CDC chunk dedup — generator fan-out + doc-partition
    // prefix window + two hash aggs; cross-doc shuffle carries chunk
    // fingerprints only
    "q_dedup_cdc",
    // round-10: exact prefix-filtered set-similarity join — candidates
    // are bounded by Σ df² over PREFIX (rare) shingle hashes, so the
    // factor reads the candidate growth the prefix cut allows; replicas
    // share zero shingles, so true pairs grow exactly K×
    "q_dedup_prefix_join",
    // round-10: the asymmetric containment variant — probe side carries
    // the FULL token relation, so the factor also reads the larger
    // candidate surface the directional bound pays for
    "q_dedup_containment",
    // round-10: LSH recall scoring — both pair sets' constructions plus
    // a pair-keyed join; the factor reads truth+candidate growth
    "q_dedup_lsh_recall",
    // round-10 third wave: sorted-neighborhood blocking — one block-key
    // shuffle + a w=3 lead window (pair count ≤ 3n by construction), so
    // the factor should read the shingle build + sort, never a
    // quadratic block blow-up
    "q_dedup_snm",
    // round-13: entity resolution — record synthesis is map-only off
    // the supplier catalog, blocking is the SNM w=3 window (pair count
    // ≤ 3n), trigram verify map-side: the factor reads the catalog-K×
    // sort, never a block blow-up
    "q_er_suppliers")

  /** The similarity-search family over the embeddings replica (fixed 1×
    * query side, K× corpus — the serving shape). The corpus self-join is
    * the one shape whose CANDIDATE set grows quadratically in per-bucket
    * occupancy under fixed bucket bits (measured 4.48× at 50× with the
    * oracle-pinned 8-bit key), so three variants are measured side by
    * side: the pinned 8-bit oracle form, the explicit `@12bit` fix, and
    * `@auto` — the OPERATOR DEFAULT (SignLsh.bitsFor, no bits argument),
    * which must track the explicit fix. `q34c_knn_join@auto` is the same
    * default through the k-NN join. */
  val simHeavy: Seq[String] = Seq(
    "q34_cosine_topk", "q34b_ann_ivf", "q34c_knn_join",
    "q34c_knn_join@auto", "q_knn_classifier", "q34d_ann_multiprobe",
    "q34e_pq_ann",
    "q_decontaminate_semantic", "q_dedup_embedding",
    "q_dedup_embedding@12bit", "q_dedup_embedding@auto",
    "q_dedup_semdedup", "q_dedup_semdedup@sqrtk",
    "q_dedup_semdedup@joinassign",
    "q_embed_project", "pca_project",
    // round-8: multi-table LSH — the oracle-pinned 8-bit 2-table form
    // and the operator default (auto bits per table); the expected cost
    // is ~2× the matching single-table row (the recall/cost trade), NOT
    // super-linear growth once @auto holds occupancy flat
    "q_dedup_embedding_mt", "q_dedup_embedding_mt@auto",
    // round-8 third pass: SQ8 ADC is a map-only scan over codes + a
    // top-50 partial — expected ≈linear absolute cost, flat vs the
    // brute-force q34_cosine_topk row it tiers under
    "q34f_sq8_ann",
    // round-11: per-label centroid drift — aggregate-first (one
    // (label, dim) int-sum agg is the only data-sized stage), expected
    // ≈linear scan-bound factor
    "q_embed_drift")

  /** The text-analysis scoring family: map-side expressions + one agg
    * each, vocab/LM/idf sides broadcast (plan-asserted in
    * PlanShapeSpec) — expected ≈flat factors; measured to close the
    * last family without execution evidence. Reads documents. */
  val textHeavy: Seq[String] = Seq(
    "q_text_tfidf", "q_text_perplexity", "q_text_langid",
    "q_text_quality", "q_text_fingerprint", "q_text_tokens",
    "q_text_classifier", "q_text_lm_bigram",
    // round-8 third pass: map-only generator fan-out (~n_tok/48 rows per
    // document, no shuffle) — the factor reads pure scan+hash cost
    "q_chunk_windows",
    // entropy: one explode + two partial-agged hash aggs; stratified
    // sample: one source-partition window + rollup
    "q_text_entropy", "q_stratified_sample",
    // round-9: concat-and-chop packing — blocked prefix-sum windows, the
    // factor reads tokenize + two block-bounded window passes
    "q_pack_chop",
    // round-9: token-budget mixing (catalog rollup + broadcast-back +
    // map-only draw) and quality-weighted sampling (classifier scoring
    // + one rollup — the q_text_classifier compute shape)
    "q_token_budget_mix", "q_sample_quality",
    // round-9: shard manifest — one hash rollup, checksum bounded by
    // shard size
    "q_shard_manifest",
    // round-10: BM25 (tf/dl aggs + broadcast query&df sides), trigram
    // diversity (one hash agg over xxhash64 trigrams + per-source
    // window), kappa agreement (map-only labeling + catalog rollup) —
    // all expected ≈linear scan-bound factors
    "q_text_bm25", "q_ngram_diversity", "q_label_kappa",
    // round-10 second wave: Gopher rules (ONE native gopher_stats map
    // stage, scan-bound) and the inverted index (explode → two
    // map-side-combinable hash aggs, posting heads bounded at 32)
    "q_text_gopher", "q_inverted_index",
    // round-11: sharded full postings (bounded 32-entry pages — the
    // factor reads the same K× term-domain hash aggs as the index head,
    // plus the per-term rank window) and RRF fusion (two scorers over
    // ONE shared pruned hits table; broadcast query side fixed at 1×)
    "q_inverted_postings", "q_retrieval_rrf",
    // round-13: MMR re-rank — one tokenize scan + one (doc, token) agg
    // (checkpointed), a TakeOrdered candidate cut, then constant-size
    // (20-candidate) sim + greedy stages: the factor reads the scan+agg
    "q_retrieval_mmr",
    // round-13: DSIR selection — one bigram explode (checkpointed),
    // two 8192-bucket-domain aggs, a broadcast log-ratio join back,
    // one per-doc sum + TakeOrdered-20: the factor reads the explode
    // + the per-doc agg; the bucket domain is constant at any K
    "q_dsir_select",
    // round-13: DSIR resampling — the same score build plus the
    // q_sample_systematic block prefix-sum; expect its factor to track
    // q_dsir_select's (the scoring dominates, the PPS is doc-sized)
    "q_dsir_resample",
    // round-13: per-source KL drift — one bigram explode + two
    // bucket-domain aggs; the terms relation is 8192 × sources at any
    // K, so the factor reads the explode alone
    "q_text_kl_drift",
    // round-11: transposition-aware edit distance — one (source) window
    // + the native O(60²) kernel per successor pair, scan-bound like
    // q_text_damerau
    "q_text_damerau",
    // round-12: TextRank — the replica's per-word suffix grows the
    // vocab a full K× (the bpe_train worst-case note), so the factor
    // reads K× vocab-sized round tables over a K× pair-explode: an
    // upper bound on real-corpus behavior (Heaps' law grows vocab ≪ K×)
    "q_text_textrank",
    // round-12 second wave: systematic PPS sampling — a 2-column scan
    // into the blocked prefix-sum decomposition; the offset pass is
    // 1000× smaller than the corpus, so the factor reads the scan
    "q_sample_systematic",
    // round-12 second wave: AUC harness — two map-only scoring passes
    // (one native classifier_scores, one stopword filter) into
    // score-DOMAIN-sized aggs; expect the scan to dominate
    "q_eval_auc",
    // round-13 second wave: retrieval evaluation — all ride the shared
    // bm25Hits build (tf/dl aggs, broadcast query side), so the factors
    // should track q_text_bm25; ranking windows run over PRUNED hits
    "q_eval_mrr", "q_eval_ndcg", "q_eval_map",
    // round-13 second wave: calibration (the q_eval_auc scoring passes
    // into a 2×10-bin agg — the tightest state domain in the suite) and
    // the confusion readout (one langid scoring pass into a ≤25-cell
    // agg); both should read pure scan cost
    "q_eval_calibration", "q_eval_confusion",
    // round-13 second wave: curriculum pacing — one quality-scoring
    // scan into a ≤1001-bucket domain agg + a bucket-partitioned rank
    // window + broadcast offsets; the scoring scan should dominate
    "q_curriculum",
    // round-13 third wave: ranker agreement — the shared dualRanks
    // build (the q_retrieval_rrf scan shape) + a ≤190-pair-per-query
    // constant stage; the factor should track q_eval_mrr
    "q_eval_rankcorr",
    // round-13 third wave: sliced AUC — the q_eval_auc scan shape with
    // (evaluator × source × score)-domain aggs; expect its factor
    "q_eval_subgroup",
    // round-13 fifth wave: McNemar — one map-only dual-decision pass
    // into a 1-row agg; pure scan cost
    "q_eval_mcnemar")

  /** The join/window/agg families (round-8 VERDICT #2): the heaviest
    * shuffle shapes outside dedup — the as-of union+window plan (SURVEY
    * §7.6 itself flags it shuffle-heavy; q13b is the binned-range-join
    * alternative measured next to it), cube, exact percentile, window
    * frames, sessionization, funnel. events queries scale by series
    * COUNT (constant length); orders/lineitem get disjoint key ranges. */
  val sqlHeavy: Seq[String] = Seq(
    "q13_asof_join", "q13b_asof_interval", "q16b_cube", "q18_percentile",
    "q18b_percentile_sorted", "q21_frames", "q_sessionize", "q_funnel",
    // round-8: linear gap fill (grid generator + one fused 4-function
    // window) and MAD outliers (two exact-percentile aggs + two joins,
    // all on the user_id partitioning) — series count grows K×,
    // per-series work constant
    "q_gapfill_linear", "q_anomaly_mad",
    // round-8 second pass: winsorize (percentile band + clipped rollup),
    // spread/elapsed (lag window + agg), Welford and CUSUM SeriesFolds
    "q_winsorize", "q_spread_elapsed", "q_welford_moments",
    "q_anomaly_cusum",
    // round-8 third pass: counter rate (lag window + int rollup), rolling
    // median (collect_list(11) window), ACF (3 lead windows + 18-sum agg),
    // seasonal profile (one hash agg, catalog-sized output) — series
    // count grows K×, per-series work constant
    "q_rate_counter", "q_moving_median", "q_autocorr", "q_seasonal_profile",
    // round-9: OLS trend (five int sums in one agg over the series key)
    // and Theil-Sen (per-series O(L²) pair self-join, L bounded by the
    // data model — series count grows, pair count per series does not)
    "q_predict_linear", "q_theil_sen",
    // round-9: cohort rate triangle (user-week distinct + catalog-sized
    // rollups) and the A/B readout (per-user agg → 2-row variant agg)
    "q_cohort_rates", "q_ab_test",
    // round-9: the three InfluxQL per-point transforms in one fused
    // Window node (plan-verified) over one series-key exchange
    "q_series_transforms",
    // deseasonalize = profile agg + broadcast join-back (map-only after
    // the catalog-sized profile)
    "q_deseasonalize",
    // LTTB-lite = ranking window + two joins against the rows/30 bucket
    // stats, all on the user_id partitioning
    "q_downsample_lttb",
    // concurrency = sessionize + distributed prefix sum (per-day windows
    // + catalog-sized offset join) — the factor reads the session agg,
    // never a global-window serialization
    "q_concurrency",
    // state runs = two windows on one user_id partitioning + hash agg;
    // snapshot diff = aggregate-first keyed full-outer (key-cardinality
    // join sides, never raw fact rows); burn rate = hourly rollup +
    // catalog-sized trailing windows
    "q_state_runs", "q_snapshot_diff", "q_burn_rate",
    // the TPC-H Q5 star: two fact shuffles + broadcast dims at any SF
    "q_tpch_local_supplier",
    // cross-corr = aggregate-first (type,hour) sums, pair join carries
    // series-x-hours rows never raw events
    "q_cross_corr",
    // round-10: changes/resets — one lag window + catalog rollup on the
    // series key, the q_spread_elapsed shape
    "q_changes_resets",
    // round-10: RSI/CMO gain-loss readout — same lag+rollup shape, all
    // integer arithmetic
    "q_tech_indicators",
    // round-10: PromQL vector binops as ONE conditional hash agg on the
    // hour bucket (the oracle runs the textbook four-join form)
    "q_vector_binop",
    // round-10: Kalman filter — the q_welford_moments SeriesFold shape
    // (series count grows K×, two doubles of state per series)
    "q_kalman_smooth",
    // round-10: PageRank — the factor reads the distributed edge build
    // (two fact shuffles aggregated to ≤625 edges); the 5-step power
    // iteration is driver-side model-sized work, constant in K
    "q_pagerank",
    // round-10: contiguous-trigram sequence mining — one fused 2-lead
    // Window on the shared user_id partitioning + one ≤|types|³-key agg
    "q_event_sequences",
    // round-10 third wave: Prometheus histogram_quantile — the rollup
    // is 5 fixed buckets per series-day (map-side combinable), the
    // interpolation runs on that catalog×time-sized table; WoW ratio —
    // hourly rollup + self equi-join on the rollup, never raw events
    "q_histogram_quantile", "q_wow_ratio",
    // round-10 third wave: skyline — the O(n²) dominance test
    // reformulated as one sort over the SUPPLIER-sized aggregate (the
    // facts pay one groupBy); factor reads the fact agg, the global
    // window is catalog-sized at any K. Triangle counting — the
    // replica keeps partkeys, so the DISTINCT edge set (and the wedge
    // join) is constant in K and the factor isolates the K× edge-build
    // scan + distinct shuffle, the data-sized stage at 100 TB
    "q_skyline", "q_triangle_count",
    // round-11 (the r10 VERDICT shadow set): all events-side rollup /
    // window shapes — fixed-bin histogram (one hash agg), Markov
    // transitions (one lead window + ≤|types|²-key agg), SAX (two
    // map-combinable aggs), Bollinger (one 20-row frame window),
    // attribution (one unbounded-frame window + touch² rollup), PSI
    // drift (one (type,week,bucket) count + rollup-side join),
    // statistical aggregates (one hash agg) — plus the lineitem-side
    // unpivot (map-only Expand ×4 + catalog agg)
    "q_histogram", "q_markov_transitions", "q_sax", "q_bollinger",
    "q_attribution", "q_drift_psi", "q_stat_funcs", "q_unpivot",
    // round-11: the grid-partitioned skyline (local per-cell skylines +
    // output-sized merge) measured NEXT TO the single-window form it
    // must beat once supplier cardinality grows
    "q_skyline_grid",
    // round-11: k-core peeling — replica keeps partkeys, so the graph
    // (and peel depth) is constant in K and the factor reads the K×
    // edge-build scan + distinct, the data-sized stage (the
    // q_triangle_count construction note)
    "q_kcore",
    // round-11 second wave: item-item similarity (aggregate-first; the
    // pair join is keyed by part, fan-in = suppliers-per-part which the
    // replica grows — the factor reads that fan-in), CMS build+probe
    // (map-side ×3 expand, shuffle bounded at 3072 rows/partition →
    // expect scan-bound ≈K×), link prediction (order-bounded pair-gen +
    // top-20-truncated wedges — linear in node count by construction),
    // AR(2) (one series exchange shared by lag window/tail/agg) and the
    // classical decomposition (fact-sized cents agg, then catalog-sized
    // windows)
    "q_supplier_similarity", "q_cms_heavy_hitters", "q_link_predict",
    "q_ar_forecast", "q_stl_decompose",
    // LPA: fixed 4 rounds over the support-2 backbone; the backbone
    // GROWS with K (more orders → more repeat pairs), so the factor
    // reads edge-build + K× backbone rounds — the interesting one
    "q_label_prop",
    // binary-segmentation changepoint: three windows sharing one
    // user_id exchange — the §9.11 window-family shape
    "q_changepoint",
    // round-12 second wave: seasonality strength — the stlCore
    // subtree (one fact-sized hourly agg, then catalog-sized windows)
    // plus two catalog-sized mean/deviation aggs; expect q_stl's flat
    // shape
    "q_seasonal_strength",
    // association rules: distinct projection + basket pair-gen +
    // broadcast supports; the support-2 pair table grows with K (same
    // backbone as q_label_prop) but the rank input is pruned first
    "q_basket_rules",
    // round-12: z-order — q_zorder_key reads the pure map-side
    // interleave cost; q_zorder_box builds the bucketed layout on
    // first use (artifact, amortized by the warm-up) and then
    // measures the PRUNED scan: the factor reads covered-tile growth,
    // not corpus growth
    "q_zorder_key", "q_zorder_box",
    // round-13 second wave: zone maps — ONE block-keyed hash agg over
    // the events scan (block domain grows with K, but stays output-
    // sized); expect a pure scan-bound ≈linear factor
    "q_zone_maps",
    // round-13 second wave: the pruned scan — layout+sidecar build is a
    // once-per-dir artifact (amortized by the warm-up, the q_zorder_box
    // recipe); the measured cost is the sidecar 1-row agg + the PRUNED
    // suffix scan, so the factor should read well under the data ratio
    "q_zone_scan",
    // round-14: the value-cut pruned scan — no static suffix (values
    // are layout-uncorrelated), so the factor reads the DPP survivor
    // semi-join's pruned scan; kept rows grow with surviving data (the
    // q_zone_scan output-bound caveat applies)
    "q_zone_scan_value",
    // round-14: the composed time+value cut — both prune levels in one
    // pass; output-bound on the (smaller) conjunctive survivor set
    "q_zone_scan_both",
    // round-13 second wave: KS drift — one (type, week, cents) hash agg
    // (the cents domain saturates, weeks recur in the replica) + value-
    // domain windows; expect the agg scan to dominate, near-flat tail
    "q_drift_ks",
    // round-13 second wave: skew profile — one ×2 fan-out key-count agg
    // over the events scan, then count-of-counts-DOMAIN windows (the
    // domain saturates); expect the key agg to dominate
    "q_skew_profile",
    // round-13 third wave: join-cardinality advisory — two key-count
    // hash aggs per profiled join + a key-domain histogram join; the
    // factor reads the aggs, never the joins it predicts
    "q_join_cardinality",
    // round-13 fourth wave: MERGE apply — one primary-key equi-join of
    // base vs the synthesized change feed (both grow K×) + a
    // catalog-sized readout; expect a ≈linear join-bound factor
    "q_merge_upsert",
    // round-14: the ENGINE merge — warehouse seed + mergeBatch are a
    // once-per-dir artifact (amortized by the warm-up, the q_zorder_box
    // recipe); the measured cost is the merged-state partitioned-table
    // scan + catalog-sized readout agg
    "q_merge_engine",
    // round-14: the ENGINE search — warehouse seed + index build are a
    // once-per-dir artifact; the measured cost is the term-bucket
    // pruned postings scan + per-doc agg + TakeOrdered-20 (the small
    // synthetic vocab gives near-zero term selectivity, so the factor
    // reads the pruned-scan growth honestly)
    "q_search_engine",
    // round-15: the INCREMENTAL search refresh (artifact builds half,
    // folds half) and the merge-reconciled search store — both serve
    // the same pruned-postings read shape as q_search_engine; the
    // artifact builds amortize per dir, the factor reads the serving
    // scan
    "q_search_refresh",
    "q_search_merge",
    // round-16: the scoped serving read — same artifact, the candidate
    // filter rides the pruned postings scan; the factor reads the
    // (smaller) scoped read against the K× store
    "q_search_scoped",
    // round-16: time travel — the artifact (two writes + merge +
    // retention-aware vacuum) amortizes per dir; the measured cost is
    // three snapshot scans (two AS OF retired versions resolved via
    // O(keep-window) driver metadata, one current) + catalog-sized
    // aggs, so the factor reads ≈3 corpus scans at any K — snapshot
    // resolution itself is scale-invariant
    "q_time_travel",
    // round-16: version diff — one corpus-sized full-outer equi-join of
    // two snapshot reads + a catalog-sized readout; expect a ≈linear
    // join-bound factor (the q_merge_upsert shape over engine versions)
    "q_version_diff",
    // round-13 fourth wave: equi-depth histogram — one value→count agg
    // (the cents domain saturates) + domain windows; expect the
    // count-compress scan to dominate, near-flat tail
    "q_histogram_equidepth",
    // round-12: level-wise Apriori triples — the DENSITY-RELATIVE
    // support floor (max(2, ⌊2·mean pair support⌋)) tracks the K×
    // support growth of catalog-fixed replication, so F2 (and the
    // candidate self-join's input) is IDENTICAL to the base cut at any
    // K; the factor reads the K× pair-gen + pair-support agg, never a
    // candidate blow-up
    "q_basket_triples",
    // round-12 second wave: weighted median — one (group, value) hash
    // agg collapses K× facts to the value domain, which saturates
    // (prices recur); expect the agg scan to dominate
    "q_weighted_median",
    // round-12 second wave: Bellman-Ford hub distances — the replica
    // keeps partkeys so the node domain is constant; the backbone
    // grows with K (the q_label_prop note) but stays edge-bounded, so
    // the factor reads the K× edge-build scan + the (deeper or
    // shallower) adaptive rounds over node-domain-sized dist tables
    "q_shortest_path",
    // round-13: personalized PageRank — same backbone build as
    // q_shortest_path plus exactly 4 broadcast-spread rounds whose
    // mass tables are (8 × node-domain)-bounded: the factor reads the
    // K× edge build, the rounds stay node-domain-sized
    "q_ppr",
    // round-12 second wave: IVM refresh — the store is a once-per-dir
    // artifact (amortized by the warm-up pass, the q_zorder_box
    // recipe); the measured cost is the 1/10th delta scan + dim joins
    // + catalog-sized merge, so the factor should read ~K×/10 of a
    // full-agg scan — the whole point of the operator
    "q_ivm_rollup",
    // round-13: the second registry view — same IVM shape over the
    // events fact (1/10th delta scan + one hash agg + merge); the
    // (type, hour) key domain saturates at the replica (hours recur),
    // so expect the delta scan to dominate like q_ivm_rollup
    "q_ivm_events",
    // round-14: the third registry view — per-source token totals over
    // the documents fact (1/10th delta tokenize scan + merge; the
    // source domain is catalog-fixed); expect the delta scan to
    // dominate like the other two IVM rows
    "q_ivm_tokens",
    // round-12 second wave: the two graph quality metrics —
    // assortativity is edge build + degree agg + broadcast joins + one
    // six-sum row (expect the K× edge-build scan); modularity rides
    // the SAME lpa() rounds as q_label_prop plus two hash aggs, so its
    // factor should track q_label_prop's
    "q_graph_assortativity", "q_graph_modularity",
    // round-12 second wave: banded DTW — aggregate-first PAA (one
    // (user, bucket) hash agg over the K× corpus), then a
    // CONSTANT-SIZE pair stage (top-50 blocking): factor = the agg
    // scan; the activity-rank window rides the user-domain-sized
    // count table
    "q_dtw")

  /** The LONG-SERIES stress family (round-8 VERDICT #4): both recurrence
    * formulations on a replica that concentrates K×100k points into ONE
    * series — per-key state is exactly what differs between them (the
    * SeriesFold form streams with O(1) doubles; the collect_list form
    * materializes the full series as one in-memory array on one task).
    * Run against the `long_x*` table group, not the core replica. */
  val longHeavy: Seq[String] = Seq(
    "long:q_ewma_recurrence", "long:q_ewma_recurrence@arrayfold",
    "long:q_holt_winters", "long:q_holt_winters@arrayfold")

  /** Measurable plans: the public contract plus the bucket-width variants
    * (`@auto` = the no-argument operator default the VERDICT gate is on)
    * and the superseded collect_list recurrence folds. */
  def fns: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries ++ Map[String, (SparkSession, String) => DataFrame](
      "q_dedup_embedding@12bit" ->
        ((s, d) => queries.DedupQueries.embeddingDedupPairs(s, d,
          bits = Some(12))),
      "q_dedup_embedding@auto" ->
        ((s, d) => queries.DedupQueries.embeddingDedupPairs(s, d)),
      "q34c_knn_join@auto" ->
        ((s, d) => queries.SimilarityQueries.knnJoin(s, d)),
      "q_ewma_recurrence@arrayfold" ->
        ((s, d) => queries.TimeseriesQueries.ewmaRecurrenceArrayFold(s, d)),
      "q_holt_winters@arrayfold" ->
        ((s, d) => queries.TimeseriesQueries.holtWintersArrayFold(s, d)),
      "q_dedup_semdedup@sqrtk" ->
        ((s, d) => queries.DedupQueries.semDedupScaled(s, d)),
      // the large-k assignment handover forced on (AnnIndex.assignJoin):
      // same sqrt-k centroids, argmax via broadcast-table join instead
      // of k expression literals — measured next to @sqrtk to price the
      // handover the auto threshold (k > 384) picks
      "q_dedup_semdedup@joinassign" ->
        ((s, d) => queries.DedupQueries.semDedupScaled(s, d,
          assignVia = Some("join"))),
      "q_dedup_embedding_mt@auto" ->
        ((s, d) => queries.DedupQueries.embeddingDedupPairsMultiTable(s, d)),
      // full PCA pipeline: the one-pass moments aggregate + driver
      // eigensolve run INSIDE the timed call (they are the cost), then
      // the map-only 64→16 projection over the whole corpus
      "pca_project" -> ((s, d) => {
        val emb = Tables.load(s, d, "embeddings")
        val m = operators.Pca.moments(emb, "embedding")
        val pcs = operators.Pca.principalComponents(m.cov, 16)
        operators.Pca.project(emb, "embedding", pcs, m.mean)
      }),
      // BPE training: 30 merge rounds over the word histogram. NOTE the
      // replica construction is BPE's worst case — the per-word replica
      // suffix makes every replica's words DISTINCT, so the vocabulary
      // (and the histogram the rounds iterate) grows a full K×, where a
      // real corpus grows vocab ≪ K× (Heaps' law). The factor therefore
      // upper-bounds real-corpus behavior.
      "bpe_train" -> ((s, d) => {
        val m = operators.Bpe.train(Tables.load(s, d, "documents"),
          "text", numMerges = 30)
        s.createDataFrame(m)
      }))

  def buildReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    buildDocsReplica(spark, base, out, k)
    buildEventsReplica(spark, base, out, k)
  }

  /** The per-word-suffix documents replica — by far the slowest build
    * (split/transform/concat over every replica), so it is built ONLY
    * when a selected query reads documents: an events-only run (q13,
    * q21, q_sessionize…) must not pay for K× documents construction. */
  def buildDocsReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    require(k <= 100, s"replica suffix is 2 digits; k=$k would collide")
    val docs = Tables.load(spark, base, "documents")
    val docN = (0 until k).map { r =>
      // fixed-width per-word replica tag: injective for any K, uniform
      // text length across replicas, codegen'd (split/transform/join).
      // The 1× base is built with the SAME construction (tag ~00), so
      // base and K× compare byte-for-byte in shape — suffixing only the
      // big side would bake a constant text-inflation bias into every
      // factor (round-7 review fix). n_chars is recomputed to stay
      // consistent with the transformed text.
      val tag = f"~$r%02d"
      val text = array_join(transform(split(col("text"), " "),
        w => concat(w, lit(tag))), " ")
      docs.select(
        (col("doc_id") + lit(r.toLong * 1000000000L)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_.unionAll(_))
    docN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
  }

  /** Disjoint-key events replica (series COUNT grows, length constant). */
  def buildEventsReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    require(k <= 100, s"replica suffix is 2 digits; k=$k would collide")
    val events = Tables.load(spark, base, "events")
    val evN = (0 until k).map { r =>
      events.select(
        (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionAll(_))
    evN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
  }

  /** orders/lineitem replica for the agg-family measurements: disjoint
    * order/customer key ranges per copy, every attribute column
    * unchanged — group COUNTS stay constant while group SIZES grow K×
    * (cube cells, percentile groups, join fan-in), which is the
    * at-scale shape for these queries. */
  def buildTpchReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    val orders = Tables.load(spark, base, "orders")
    val ordN = (0 until k).map { r =>
      orders.select(
        (col("o_orderkey") + lit(r.toLong * 1000000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(r.toLong * 1000000L)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.reduce(_.unionAll(_))
    ordN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/orders.parquet")

    val li = Tables.load(spark, base, "lineitem")
    val liN = (0 until k).map { r =>
      li.select(
        (col("l_orderkey") + lit(r.toLong * 1000000000L)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    }.reduce(_.unionAll(_))
    liN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")

    // customer rides the same o_custkey shift so fact⋈customer joins
    // stay total on the replica (the Q5-shape star would otherwise miss
    // every r>0 probe); nationkey is UNSHIFTED — nations/regions/
    // suppliers are the fixed catalog-sized dims, the honest 100 TB
    // shape (facts and customers grow, the catalog does not)
    val cust = Tables.load(spark, base, "customer")
    val custN = (0 until k).map { r =>
      cust.select(
        (col("c_custkey") + lit(r.toLong * 1000000L)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        // every attribute column must survive the replica — dropping
        // c_mktsegment broke q23/q_text_redact in the r11 full-suite
        // replica verify (the first run to read customer attributes)
        col("c_mktsegment"))
    }.reduce(_.unionAll(_))
    custN.repartition(8).write.mode("overwrite")
      .parquet(s"$out/customer.parquet")

    // the fixed catalog dims copy through at 1× so star joins resolve
    // against the replica dir alone (part included so a FULL-suite
    // replica verify — all 10 tables present — needs no extra step)
    Seq("supplier", "nation", "region", "part").foreach { d =>
      Tables.load(spark, base, d).coalesce(1).write.mode("overwrite")
        .parquet(s"$out/$d.parquet")
    }
  }

  /** Long-series replica: K copies of events COLLAPSED INTO ONE SERIES
    * (user_id := 1, event_id disjoint per copy) — at K=10 over sf0.1
    * that is one series of 1M points. The opposite stress of
    * [[buildReplica]]'s events (which grows the series COUNT at constant
    * length): here per-key state grows K×, which is exactly what the
    * collect_list recurrence fold cannot bound and SeriesFold can. */
  def buildLongSeriesReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    val events = Tables.load(spark, base, "events")
    val evN = (0 until k).map { r =>
      events.select(
        (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
        col("ts"), lit(1L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionAll(_))
    evN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
  }

  /** Embeddings replica: the QUERY side (vec_id=0 for single-query ANN,
    * label=0 for the k-NN join set) stays fixed at 1× — replicas carry
    * corpus rows only, the serving shape (a fixed evaluation set probing
    * a K× corpus). Each replica's vectors are circularly ROTATED by r
    * positions — an orthogonal transform, so WITHIN-replica pairwise
    * cosines (planted near-dup structure, bucket co-occupancy shape) are
    * preserved EXACTLY, while cross-replica cosines against the base
    * measure ≤ 0.65 on this corpus (verified numerically; the near-dup
    * threshold is 0.8) — the embeddings analog of the per-word suffix.
    * One deliberate approximation: the sign-LSH bucket reads dims 1..8,
    * so replica r's bucket key is the signs of ORIGINAL dims r+1..r+8 —
    * per-replica co-bucketing is statistically equivalent (same vector
    * distribution), not bit-identical; pairwise cosines, the quantity
    * the dedup threshold acts on, are what rotation preserves exactly.
    * Rotation is injective per replica only up to the 64 dims, hence the
    * K ≤ 64 guard (the similarity scaling point is measured at 10×/50×). */
  def buildEmbeddingsReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    require(k <= 64, s"embedding rotation collides past 64 replicas; k=$k")
    val emb = Tables.load(spark, base, "embeddings")
    val embN = (0 until k).map { r =>
      val rolled = if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r))
      // replicas carry CORPUS rows only: label=0 (k-NN query set),
      // vec_id=0 (single-query vector) and vec_id%20=0 (the
      // q_decontaminate_semantic benchmark membership — the r*1e9 shift
      // is ≡0 mod 20, so replicated rows would stay "benchmark" and grow
      // the held-out side K× instead of keeping it fixed) stay 1×
      val side = if (r == 0) emb
        else emb.filter(col("label") =!= 0 && col("vec_id") =!= 0 &&
          col("vec_id") % 20 =!= 0)
      side.select(
        (col("vec_id") + lit(r.toLong * 1000000000L)).as("vec_id"),
        rolled.as("embedding"), col("label"))
    }.reduce(_.unionAll(_))
    embN.repartition(16).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_scale/sf0.1x$k")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the 1× BASE is built with the identical construction (same word
    // tags, same 64-file layout): factors then measure data growth
    // alone, not text-inflation or file-layout differences between the
    // original sf0.1 and the synthetic replicas (round-7 review fix)
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE",
      "/tmp/graft_scale/sf0.1x01")

    val all = heavy ++ simHeavy ++ longHeavy ++ sqlHeavy ++ textHeavy
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // a typo mixed with valid names must fail loudly, not silently
    // shrink the measured set
    val unknown = only.getOrElse(Set()) -- all.toSet
    require(unknown.isEmpty,
      s"SPARK_GRAFT_BENCH_ONLY names unknown queries: " +
        s"${unknown.mkString(", ")}; choose from: ${all.mkString(", ")}")
    var selected = all.filter(q => only.forall(_.contains(q)))
    if (k > 64 && selected.exists(simHeavy.contains)) {
      // the rotation construction collides past 64 replicas: degrade to
      // the core measurement instead of crashing (the documented K=100
      // dedup point must keep working)
      System.err.println(s"[scale] k=$k > 64: skipping the similarity " +
        "family (embedding rotation collides; measured at k<=50)")
      selected = selected.filterNot(simHeavy.contains)
    }

    // build each table group only if a selected query reads it: a
    // similarity-only run at K=50 must not pay for 50x documents/events,
    // and an events-only run (the sqlHeavy family) must not pay for the
    // K× per-word documents transform it never reads
    val eventsSql = Set("q13_asof_join", "q13b_asof_interval", "q21_frames",
      "q_sessionize", "q_funnel", "q_gapfill_linear", "q_anomaly_mad",
      "q_winsorize", "q_spread_elapsed", "q_welford_moments",
      "q_anomaly_cusum", "q_rate_counter", "q_moving_median",
      "q_autocorr", "q_seasonal_profile", "q_deseasonalize",
      "q_downsample_lttb", "q_concurrency", "q_state_runs",
      "q_cross_corr", "q_burn_rate", "q_changes_resets", "q_tech_indicators",
      "q_vector_binop", "q_histogram_quantile", "q_wow_ratio",
      "q_histogram", "q_markov_transitions", "q_sax", "q_bollinger",
      "q_attribution", "q_drift_psi", "q_stat_funcs",
      "q_ar_forecast", "q_stl_decompose", "q_changepoint", "q_dtw",
      "q_seasonal_strength", "q_ivm_events",
      "q_zone_maps", "q_zone_scan", "q_zone_scan_value",
      "q_zone_scan_both", "q_drift_ks",
      "q_skew_profile", "q_merge_engine", "q_search_engine",
      "q_search_refresh", "q_search_merge", "q_search_scoped",
      "q_time_travel", "q_version_diff")
    val eventsHeavy = Set("q_ewma", "q_ewma_recurrence", "q32_json_funcs",
      "q_ingest_typed", "q_ingest_generator", "q_approx_quantiles")
    val needDocs = selected.exists(q =>
      (heavy.contains(q) && !eventsHeavy.contains(q)) ||
        textHeavy.contains(q))
    // q_profile_columns scans BOTH documents and events
    val needEvents = selected.exists(eventsHeavy.contains) ||
      selected.exists(eventsSql.contains) ||
      selected.contains("q_profile_columns")
    val needTpch = selected.exists(Set("q16b_cube", "q18_percentile", "q_snapshot_diff", "q_tpch_local_supplier",
      "q18b_percentile_sorted", "q_skyline", "q_skyline_grid",
      "q_triangle_count", "q_unpivot", "q_kcore",
      "q_supplier_similarity", "q_cms_heavy_hitters",
      "q_link_predict", "q_label_prop", "q_basket_rules",
      "q_basket_triples", "q_zorder_key", "q_zorder_box",
      "q_shortest_path", "q_ivm_rollup", "q_weighted_median",
      "q_graph_assortativity", "q_graph_modularity",
      "q_ppr", "q_er_suppliers", "q_join_cardinality",
      "q_merge_upsert", "q_histogram_equidepth").contains)
    val needEmb = selected.exists(simHeavy.contains)
    val needLong = selected.exists(longHeavy.contains)
    // long-series replicas live beside the core replica dirs, so the
    // SPARK_GRAFT_SCALE_BASE/SPARK_GRAFT_SCALE_DIR relocation overrides
    // (small or read-only /tmp) cover every table group
    def sibling(dir: String, name: String): String =
      new java.io.File(new java.io.File(dir).getParent, name).getPath
    val longBase = sibling(baseDir, "long_x01")
    val longOut = sibling(out, s"long_x$k")
    for ((dir, kk) <- Seq((baseDir, 1), (out, k))) {
      def build(name: String, fn: => Unit): Unit = {
        val t0 = System.nanoTime(); fn
        System.err.println(f"[scale] built ${kk}x $name at $dir in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      if (needDocs) {
        if (!new java.io.File(s"$dir/documents.parquet").exists())
          build("documents", buildDocsReplica(spark, base, dir, kk))
        else System.err.println(s"[scale] reusing documents at $dir")
      }
      if (needEvents) {
        if (!new java.io.File(s"$dir/events.parquet").exists())
          build("events", buildEventsReplica(spark, base, dir, kk))
        else System.err.println(s"[scale] reusing events at $dir")
      }
      if (needTpch) {
        // customer.parquet is the round-8 addition to this group —
        // rebuild dirs written before it exists
        if (!new java.io.File(s"$dir/lineitem.parquet").exists() ||
            !new java.io.File(s"$dir/customer.parquet").exists())
          build("orders+lineitem+customer",
            buildTpchReplica(spark, base, dir, kk))
        else System.err.println(s"[scale] reusing orders+lineitem at $dir")
      }
      if (needEmb) {
        if (!new java.io.File(s"$dir/embeddings.parquet").exists())
          build("embeddings", buildEmbeddingsReplica(spark, base, dir, kk))
        else System.err.println(s"[scale] reusing embeddings at $dir")
      }
      if (needLong) {
        val ldir = if (kk == 1) longBase else longOut
        if (!new java.io.File(s"$ldir/events.parquet").exists()) {
          val t0 = System.nanoTime()
          buildLongSeriesReplica(spark, base, ldir, kk)
          System.err.println(f"[scale] built ${kk}x long-series events at " +
            f"$ldir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        } else System.err.println(s"[scale] reusing long-series at $ldir")
      }
    }

    /** long:-prefixed rows run on the long-series table pair. */
    def dirsFor(name: String): (String, String, String) =
      if (name.startsWith("long:"))
        (name.stripPrefix("long:"), longBase, longOut)
      else (name, baseDir, out)

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // LOWER median: identical to the true median for odd run counts, and
    // the MIN for runs=2 — the upper-middle form silently reported the
    // max of 2 runs (round-7 advice), inflating both sides of a factor.
    def median(xs: Seq[Double]): Double =
      xs.sorted.apply((xs.length - 1) / 2)

    // warm-up both datasets (codegen + file index, untimed) — one query
    // per TABLE GROUP, or a mixed run leaves the embeddings side cold
    // and the first similarity query's timed runs absorb the file-index
    // and vector-codegen cost
    (selected.find(heavy.contains) ++ selected.find(simHeavy.contains) ++
      selected.find(longHeavy.contains) ++ selected.find(sqlHeavy.contains) ++
      selected.find(textHeavy.contains))
      .foreach { q =>
        val (fq, b, o) = dirsFor(q)
        try { run(fns(fq)(spark, b)); run(fns(fq)(spark, o)) }
        catch { case _: Throwable => () }
      }

    val results = selected.map { name =>
      val (fnName, bDir, oDir) = dirsFor(name)
      val fn = fns(fnName)
      val tBase = median((1 to runs).map(_ => time(run(fn(spark, bDir)))))
      val tBig = median((1 to runs).map(_ => time(run(fn(spark, oDir)))))
      val factor = tBig / tBase
      println(f"""{"query":"$name","base_sec":$tBase%.3f,"x${k}_sec":$tBig%.3f,"factor":$factor%.2f}""")
      (name, tBase, tBig, factor)
    }
    val sumBase = results.map(_._2).sum
    val sumBig = results.map(_._3).sum
    println(f"""{"metric":"scale_total","k":$k,"base_sec":$sumBase%.2f,"x${k}_sec":$sumBig%.2f,"factor":${sumBig / sumBase}%.2f,"queries":${results.length}}""")
    spark.stop()
  }
}
