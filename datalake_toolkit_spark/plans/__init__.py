"""Query plans: the engine's verifiable query surface.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame; ``ORACLE`` maps
the same names to DuckDB-runnable ANSI SQL producing identical columns.
"""

from datalake_toolkit_spark.plans.queries import ORACLE, QUERIES
from datalake_toolkit_spark.plans import llm_queries  # noqa: F401  (registers)
from datalake_toolkit_spark.plans import catalog_queries  # noqa: F401  (registers)
from datalake_toolkit_spark.plans import endpoint_queries  # noqa: F401  (registers)
from datalake_toolkit_spark.plans import lakehouse_queries  # noqa: F401  (registers)

# The round driver hash-checks only the first 50 ``queries()`` entries.
# Names below were driver-verified green in BOTH CORRECTNESS_r01 and
# CORRECTNESS_r02 and their plan shapes are covered by retained queries,
# so they are pushed past the window to make room for the catalog /
# endpoint / llm-tail queries (never driver-checked through round 2) and
# for operators added this round. They still run in the local parity
# suite (tests/test_oracle_parity.py) every round.
DEMOTED: tuple[str, ...] = (
    # r11 staleness rotation: six r2-stale shapes RETURN to the window
    # (q4_priority_with_returns, q5_region_revenue, q10_returned_items,
    # q19_disjunctive_revenue, q_nation_region,
    # q_rollup_supplier_balance — removed from this tuple), plus the
    # three r11 births enter (q_filtered_ann_per_query,
    # q_index_time_travel, q_raw_file_docs — never driver-checked).
    # Nine multi-green shapes rotate out in exchange (tagged "r11"
    # below), each with its plan shape still covered in-window.
    #
    # r12 rotation (the r11 verdict's #1 ask): the eight r11 births
    # parked at the bottom of this tuple are PROMOTED (removed below),
    # and the full r2/r3-stale cohort RETURNS per the staleness
    # discipline — q_retained_customers, q_churned_customers,
    # q_customers_without_orders, q_big_spenders, q_embedding_norms,
    # q_approx_aggregates (last green r2) and q_fingerprints,
    # q_lang_id, q_simhash, q_ddb_json_roundtrip (last green r3) — all
    # removed from this tuple. Eighteen multi-green shapes rotate out
    # in exchange (tagged "r12" below), each with its plan shape still
    # covered in-window or pinned by local parity + dedicated tests.
    # r4 rotation: q_year_orders / q_escape_props / q_uri_normalize /
    # q_user_event_map return to the window (their shared helpers —
    # events.ts loading, scalar functions — changed in r3/r4); in
    # exchange, four r3-green queries whose plan shapes stay covered
    # move out: q_sanitize_headers (regexp projection ~ q_escape_props),
    # q_skewed_list_parse (string parse ~ q_ddb_json_roundtrip),
    # q_fingerprints + q_lang_id (expression-only text scalars ~
    # q_text_stats).
    # r5 rotation: the four r4 queries parked here before ever seeing a
    # driver window (q_doc_chunks, q_token_shards, q_embedding_pool,
    # q_profile_orders) are PROMOTED, plus three new queries enter
    # (q_catalog_search, q_interval_join_left, q_asof_forward_tolerance).
    # Seven twice-green (r3+r4) shapes rotated out in exchange.
    # (r13 staleness rotation: the r4-stale cohort parked here —
    # q14_promo_share, q2_cheapest_per_type, q_catalog_columns,
    # q_media_resize, q_cosine_near_dups, q_jaccard_near_dups,
    # q_windowed_event_counts, q_quality_filter_pipeline — RETURNS to
    # the window per the r12 verdict's #1 ask; removed from this
    # tuple.)
    # r6 rotation: ALL 18 never-driver-checked queries enter the window
    # (the 11 TPC-H tail shapes q7/q8/q9/q11/q13/q15/q16/q17/q20/q21/q22
    # plus q_word_rarity, q_boilerplate, q_simhash_near_dups,
    # q_funnel_conversion, q_cohort_retention, q_event_paths,
    # q_hashed_embeddings) together with the new q_catalog_walk. In
    # exchange, 19 shapes green in 3+ driver rounds rotate out, each with
    # its plan shape still covered in-window:
    # (r13 staleness rotation: the r5-stale cohort parked here —
    # q_order_parts_sorted, q_sessionized_users, q_text_stats,
    # q_dedup_exact, q_minhash_near_dups, q_ann_cosine_topk,
    # q_multimodal_features, q_corpus_curation, q_top_parts_by_revenue,
    # q_year_orders, q_user_event_map, q_asof_join, q_uri_normalize,
    # q_escape_props, q_time_functions, q_catalog_roundtrip_ids,
    # q_catalog_skewed_info, q_show_tables — RETURNS to the window per
    # the r12 verdict's #1 ask; removed from this tuple.)
    # r7 rotation: the four r6-born flagships (q_curate_corpus_full,
    # q_semantic_dedup, q_banded_cosine_near_dups, q_incremental_minhash)
    # are PROMOTED out of this tuple into the window, together with the
    # three r7 births (q_centered_cosine_near_dups, q_stream_near_dedup,
    # q_bpe_train). Seven multi-green shapes rotate out in exchange,
    # each with its plan shape still covered in-window:
    # r7 second wave: q_partition_evolution enters (the new
    # evolve_partitioning flagship, never driver-checked); q_time_travel
    # (4x green r4-r7 window) rotates out — its shape (multi-version
    # commits + an old-version read) is subsumed in-window by
    # q_partition_evolution (reads v0 under the PRE-evolution layout)
    # and q_snapshot_retention (history/vacuum machinery).
    # r7 third wave: q_setsim_near_dups enters (prefix-filtered exact
    # set-similarity join, never driver-checked; same output contract
    # and oracle shape as the long-demoted q_jaccard_near_dups, so the
    # exact-Jaccard shape RE-enters the window via the scalable
    # variant). q_stream_dedup (6x green r1-r6, the most-proven query
    # in the window) rotates out — its streaming exactly-once shape is
    # covered by q_stream_near_dedup (incoming foreachBatch replay)
    # and the q_interval_join pair.
    # q_dup_ngram_stats enters (span-level duplication stats, never
    # driver-checked); q12_priority_by_returnflag (4x green r3-r6)
    # rotates out — its agg-core shape stays covered by the in-window
    # TPC-H set (q1-family aggs via q9/q13/q16/q17/q18).
    # q_file_skipping enters (manifest-stats data skipping, never
    # driver-checked); q_snapshot_retention (4x green r3-r6) rotates
    # out — lakehouse commit/read machinery stays covered in-window by
    # q_partition_evolution and q_file_skipping itself.
    # q_mor_delete enters (merge-on-read predicate deletes, never
    # driver-checked); q_interval_join (3x green r4-r6) rotates out —
    # q_interval_join_left stays, the same stream-stream interval
    # operator in its superset (outer) mode.
    # q_mor_upsert enters (merge-on-read MERGE, never driver-checked);
    # q18_large_orders (4x green r3-r6) rotated out in r7 and RETURNED
    # in r8's staleness rotation (below).
    # q_shallow_clone enters (zero-copy clone, never driver-checked);
    # q_catalog_partition_docs (4x green r3-r6) rotates out — catalog
    # assembly machinery stays covered by q_catalog_walk and
    # q_catalog_search in-window.
    # q_bigram_familiarity enters (corpus-grounded fluency scoring,
    # never driver-checked); q_stratified_sample (3x green r4-r6)
    # rotates out — sampling machinery stays covered in-window by
    # q_token_shards and q_pack_windows.
    # r8 rotation: every query has now been driver-checked at least
    # once (r7 verdict), so rotation shifts to STALENESS — the four
    # longest-unchecked high-value shapes RETURN to the window
    # (q1_pricing_summary last green r4, q18_large_orders r6,
    # q_merge_upsert r6, q_catalog_table_docs r6 — removed from this
    # tuple above), and the new q_mor_upsert_partitioned (partitioned
    # merge-on-read, never driver-checked) enters. Five multi-green r07
    # shapes rotate out in exchange, each still covered in-window:
    # r8 third wave: q_mor_delete_by_key enters (merge-on-read key
    # tombstones, never driver-checked); q17_small_qty_revenue (2x
    # green r6-r7) rotates out — its correlated-scalar-subquery shape
    # stays covered in-window by q20_excess_stock.
    # r9 staleness rotation: the five longest-unchecked demoted shapes
    # RETURN to the window (q_sanitize_headers last green r3,
    # q_skewed_list_parse + q_consecutive_part_ids r4,
    # q_customer_struct_roundtrip + q_latest_event_per_user r5 —
    # removed from this tuple above). Five multi-green r07+r08 shapes
    # rotate out in exchange, each with its plan shape still covered
    # in-window:
    # r9 second wave: q_incremental_semantic enters (incremental
    # semantic dedup vs the persistent band/vector ledger, the r9
    # flagship birth — never driver-checked, so it belongs in-window
    # per the rotation discipline above). q_repetition_stats (4x green
    # r5-r8) rotates out in exchange — its text-stats expression shape
    # stays covered in-window by q_word_rarity, the same coverage
    # argument that demoted q_boilerplate this round.
    # r9 third wave: q_persistent_ivf enters (the persistent IVF index
    # lifecycle — build / incremental MoR add / partition-pruned
    # serve — never driver-checked). q_event_paths (3x green r6-r8)
    # rotates out in exchange — its sequence/window shape stays
    # covered in-window by q_funnel_conversion and q_cohort_retention.
    # r9 fourth wave: q_keyword_search enters (lexical retrieval —
    # inverted match + coordination ranking, never driver-checked).
    # q_token_shards (4x green r5-r8) rotates out in exchange — its
    # sharding shape is composed in-window by q_curate_corpus_full,
    # the same argument that demoted q_pack_windows this round.
    # r9 fifth wave: q_postings_search enters (the PERSISTENT inverted
    # index — two bucket-scoped MoR add commits + a term-bucket-pruned
    # serve — never driver-checked). q_banded_cosine_near_dups (3x
    # green r6-r8) rotates out in exchange — its banded-LSH cosine
    # pairing is composed in-window by q_incremental_semantic (which
    # runs cosine_near_dup_pairs with n_bands=3 inside each batch) and
    # covered by q_centered_cosine_near_dups (same operator, center
    # superset).
    # r9 sixth wave: q_phrase_search and q_hybrid_search enter (exact
    # adjacency matching and RRF fusion of the lexical + vector
    # rankings — never driver-checked). Two 3x-green (r6-r8) shapes
    # rotate out in exchange: q_funnel_conversion (ordered-sequence
    # matching — q_phrase_search is the stricter ordered-window form
    # and q_cohort_retention keeps the event-analytics plane
    # in-window) and q11_important_stock (group-agg vs scalar
    # threshold — covered by q20_excess_stock's correlated scalar and
    # q22's scalar-avg subquery).
    # r9 seventh wave: q_index_phrase enters (phrase adjacency served
    # from the positional postings index — never driver-checked).
    # q16_supplier_count (3x green r6-r8) rotates out in exchange —
    # its NOT-IN anti-semantics and distinct-count aggregate stay
    # covered in-window by q21_waiting_suppliers (exists/not-exists
    # chains) and q22_sales_opportunity (scalar subquery + count agg).
    # r10 rotation: five births enter (q_ivf_quantized, q_index_hybrid,
    # q_index_corpus_stats, q_grouping_sets_revenue,
    # q_multi_window_prices — never driver-checked), six r2/r3-stale
    # shapes RETURN per the staleness discipline (q3_shipping_priority,
    # q6_forecast_revenue, q_all_parties, q_pivot_order_priority,
    # q_doc_words_indexed, q_source_route — removed from this tuple
    # above), and the five r7/r8 lakehouse-lifecycle shapes the births
    # had silently displaced (q_shallow_clone, q_mor_upsert,
    # q_mor_delete, q_file_skipping, q_partition_evolution) re-enter.
    # Eleven multi-green shapes rotate out in exchange, each with its
    # plan shape still covered in-window:
    # r10 second wave: q_index_decontaminate enters (benchmark
    # decontamination served from the positional index — never
    # driver-checked). q_cohort_retention (4x green r6-r9) rotates out
    # in exchange — its sequence-window shape stays covered in-window
    # by q_multi_window_prices (stacked lag/lead/running/rank) and
    # q_stateful_running_status.
    # r10 third wave: q_filtered_ann enters (metadata-filtered
    # quantized vector search — never driver-checked).
    # q7_volume_shipping (4x green r6-r9) rotates out in exchange —
    # its multi-dim join-tree shape stays covered in-window by
    # q9_product_profit and q21_waiting_suppliers.
    # r11 rotation (see the header comment): nine multi-green shapes
    # out for the three births + six stale returns.
    "q3_shipping_priority",  # 3x (r1,r2,r10); join-agg-topk ~ q5/q10 returning
    "q6_forecast_revenue",  # 3x (r1,r2,r10); filter-agg ~ q19 returning
    "q_source_route",  # 2x (r3,r10); regex routing runs INSIDE q_raw_file_docs' real pipeline
    "q_incremental_minhash",  # 4x (r7-r10); band-keyed ledger ~ q_stream_near_dedup + q_incremental_semantic
    "q_centered_cosine_near_dups",  # 4x (r7-r10); banded-cosine pairing composed by q_semantic_dedup
    "q_persistent_ivf",  # 2x (r9,r10); IVF lifecycle+serve ~ q_ivf_quantized + q_filtered_ann(+_per_query)
    "q_keyword_search",  # 2x (r9,r10); same output contract served by q_postings_search
    "q_phrase_search",  # 2x (r9,r10); batch phrase ~ q_index_phrase (positions-served superset)
    "q_hybrid_search",  # 2x (r9,r10); batch fusion ~ q_index_hybrid (index-served superset)
    # (r11's eight parked births were PROMOTED into the r12 window —
    # removed from this tuple per the discipline above.)
    #
    # r12 rotation out-list: eighteen multi-green shapes make room for
    # the eight promoted births + the ten-query r2/r3-stale cohort.
    # Green counts from CORRECTNESS_r01..r11; every shape stays in the
    # local parity suite (tests/test_oracle_parity.py) every round.
    "q_video_frames",  # 9x (r3-r11); binary mapInPandas shape pinned by tests/test_multimodal.py
    "q1_pricing_summary",  # 8x; lineitem agg core ~ q_approx_aggregates (returning) + q4/q19 stay
    "q_consecutive_part_ids",  # 7x; X5 seeded-id two-pass pinned by its equivalence test
    "q_customer_struct_roundtrip",  # 7x; P6/P7 struct pack/unpack ~ property test + parity
    "q_interval_join_left",  # 7x; stream-stream interval join ~ q_stream_near_dedup + windows tests stay
    "q15_top_supplier",  # 6x; W2 scalar-max ranking ~ q_multi_window_prices stays
    "q21_waiting_suppliers",  # 6x; exists/not-exists chains ~ q20/q22 stay
    "q9_product_profit",  # 6x; multi-join agg tree ~ q5_region_revenue + q10 stay
    "q_catalog_walk",  # 6x; catalog 3-level walk ~ bulk-variant equality test + r≤10 catalog set
    "q_stateful_running_status",  # 6x; applyInPandasWithState replay pinned by streaming tests
    "q_shallow_clone",  # 5x; clone+divergent-MERGE ~ q_mor_upsert_partitioned stays
    "q_mor_upsert",  # 5x; MoR MERGE ~ q_mor_upsert_partitioned stays
    "q_mor_delete",  # 5x; MoR predicate delete ~ q_mor_delete_by_key stays
    "q_file_skipping",  # 5x; manifest-stats pruning pinned by lakehouse tests
    "q_partition_evolution",  # 5x; evolve+MERGE lifecycle ~ q_mor_upsert_partitioned stays
    "q_curate_corpus_full",  # 5x; composes decon/pii/mixture — components parity-green, plan-shape test stays
    "q_semantic_dedup",  # 5x; LSH-blocked semantic dedup ~ q_incremental_semantic stays
    "q_setsim_near_dups",  # 5x; prefix-filtered set-sim join ~ q_stream_near_dedup band probe stays
    # r12 second wave: q_index_bm25_pruned enters (max-score pruned
    # BM25 serve, the r11 verdict's #2 ask — never driver-checked);
    # q_mor_delete_by_key (4x green r8-r11) rotates out in exchange —
    # its partitioned-tombstone shape stays covered in-window by
    # q_mor_upsert_partitioned and by the lakehouse test suite.
    "q_mor_delete_by_key",
    # r12 third wave: q_index_decontaminate_slop enters (near-verbatim
    # decontamination over the positional index, the r11 verdict's
    # stretch #7 — never driver-checked); q_dup_ngram_stats (5x green
    # r7-r11) rotates out in exchange — its n-gram extraction
    # machinery stays covered in-window by q_index_decontaminate and
    # the incoming slop variant, and the span-dup composition stays
    # in local parity.
    "q_dup_ngram_stats",
    # r13 rotation (the r12 verdict's #1 ask): the full r4/r5-stale
    # cohort RETURNS to the window — 8 queries last driver-green in r4
    # and 18 in r5, all listed in the two r13 notes above. Twenty-six
    # multi-green shapes rotate out in exchange, each with its plan
    # shape still covered in-window or pinned by local parity + tests
    # (green counts from CORRECTNESS_r01..r12):
    "q22_sales_opportunity",  # 7x (r6-r12); scalar-avg subquery ~ q20-family shapes via q2_cheapest_per_type (returning correlated min)
    "q20_excess_stock",  # 7x (r6-r12); correlated scalar subquery ~ q2_cheapest_per_type (returning)
    "q_bigram_familiarity",  # 6x (r7-r12); corpus-grounded text stats ~ q_text_stats (returning)
    "q_bpe_train",  # 6x (r7-r12); iterative merge loop pinned by tests/test_llm.py BPE suite
    "q_stream_near_dedup",  # 6x (r7-r12); foreachBatch ledger replay ~ q_raw_file_docs stays + streaming plane gate (r13 birth)
    "q_pivot_order_priority",  # 5x; pivot ~ q_grouping_sets_revenue stays
    "q_all_parties",  # 5x; union/selectExpr ~ q_big_spenders + returning cohort scans
    "q_doc_words_indexed",  # 5x; posexplode collect ~ q_order_parts_sorted (returning A2 shape)
    "q_sanitize_headers",  # 5x; regex projection ~ q_escape_props + q_uri_normalize (returning)
    "q_skewed_list_parse",  # 5x; string parse ~ q_ddb_json_roundtrip stays
    "q_mor_upsert_partitioned",  # 5x; MoR MERGE ~ index lifecycles (q_index_rebucket/q_index_sync) stay + lakehouse tests
    "q5_region_revenue",  # 4x; join-agg ~ q10_returned_items family via returning q_top_parts_by_revenue
    "q10_returned_items",  # 4x; join-agg-topk ~ q_top_parts_by_revenue (returning W2)
    "q_rollup_supplier_balance",  # 4x; rollup ~ q_grouping_sets_revenue stays
    "q4_priority_with_returns",  # 4x; exists-semi agg ~ q_retained_customers stays
    "q19_disjunctive_revenue",  # 4x; disjunctive filter-agg ~ q14_promo_share (returning)
    "q_nation_region",  # 4x; broadcast dim join ~ q5-family via returning cohort
    "q_lang_id",  # 4x; expression-only text scalars ~ q_text_stats (returning)
    "q_fingerprints",  # 4x; rolling-hash scalars ~ q_text_stats (returning)
    "q_simhash",  # 4x; bit-fold scalars ~ q_minhash_near_dups (returning)
    "q_incremental_semantic",  # 4x; band/vector ledger ~ q_ann_sync + q_index_sync stay
    "q_postings_search",  # 4x; postings lifecycle ~ q_index_bm25_pruned + q_index_time_travel + q_index_corpus_stats stay
    "q_index_phrase",  # 4x; positional serve ~ q_index_phrase_slop (superset) stays
    "q_embedding_norms",  # 3x; array folds ~ q_jl_projection + q_ann_cosine_topk (returning)
    "q_churned_customers",  # 3x; anti-join family ~ q_retained_customers stays
    "q_customers_without_orders",  # 3x; same anti-join family ~ q_retained_customers stays
    # r13 second wave: q_skip_report enters (the skipping stack as a
    # hash-checked observable contract, the r12 verdict's #7 ask —
    # never driver-checked). q_index_hybrid (3x green r10-r12)
    # rotates out in exchange — its fused two-modality serve stays
    # covered in-window by q_index_hybrid_filtered (the per-query-
    # filtered superset of the same lifecycle and fusion).
    "q_index_hybrid",
    # r13 third wave: q_stream_plane_sync enters (the streaming
    # search-plane follower promoted from pytest into a driver gate,
    # the r12 verdict's stretch #8 — never driver-checked).
    # q_index_decontaminate (3x green r10-r12) rotates out in
    # exchange — its phrase-probe decontamination shape stays
    # covered in-window by q_index_decontaminate_slop (the sloppy
    # superset of the same index-served probe).
    "q_index_decontaminate",
    # r14 rotation (the r13 verdict's #1 ask): the full 19-query r6/r7
    # staleness cohort RETURNS to the window (13 last green r6, 6 last
    # green r7 — removed from this tuple above; the lakehouse layer
    # under q_time_travel / q_snapshot_retention / q_jdbc_roundtrip
    # changed again in r13), plus the two r14 births enter
    # (q_ivf_two_level — the persistent two-level IVF lifecycle — and
    # q_ivf_probe_report — the vector skip_report; never
    # driver-checked). Twenty-one multi-green shapes rotate out in
    # exchange, each freshly re-verified green in r13 and with its
    # plan shape still covered in-window or pinned by local parity +
    # dedicated tests:
    "q_year_orders",  # 3x; year/cast scalars ~ q_time_functions stays
    "q_user_event_map",  # 3x; A1 kv->map agg pinned by its property test + parity
    "q_escape_props",  # 3x; F4 regex projection ~ q_uri_normalize stays
    "q_big_spenders",  # 3x; P4 SQL-string filter rides the returning TPC-H set
    "q_retained_customers",  # 3x; exists-semi agg ~ q12/q13 returning
    "q2_cheapest_per_type",  # 3x; correlated-min subquery ~ q17_small_qty_revenue returning
    "q14_promo_share",  # 3x; conditional-agg ratio ~ q12_priority_by_returnflag returning
    "q_quality_filter_pipeline",  # 3x; composed by q_corpus_curation (stays)
    "q_media_resize",  # 3x; binary Arrow plumbing ~ q_multimodal_features stays
    "q_jaccard_near_dups",  # 4x; exact-Jaccard pairing ~ q_dup_clusters returning + q_minhash_near_dups stays
    "q_cosine_near_dups",  # 4x; banded cosine pairing ~ q_lsh_cosine_near_dups returning
    "q_ann_cosine_topk",  # 4x; brute-force topk IS q_ivf_two_level's oracle shape; q_jl_projection stays
    "q_filtered_ann",  # 3x; covered by q_filtered_ann_per_query (per-query superset, stays)
    "q_ivf_quantized",  # 3x; int8 candidate+rescore exercised by q_ann_sync + q_ivf_rebuild (stay)
    "q_ivf_recall",  # 2x (r12,r13); probed-vs-live arithmetic ~ q_ivf_probe_report (incoming, hash-gated)
    "q_windowed_event_counts",  # 3x; tumbling/sliding windows ~ q_sessionized_users stays + q_stream_dedup returning
    "q_catalog_columns",  # 3x; catalog assembly ~ q_catalog_search returning + q_catalog_roundtrip_ids stays
    "q_catalog_skewed_info",  # 3x; expression join ~ q_catalog_partition_docs returning
    "q_show_tables",  # 3x; catalog SQL scan ~ q_catalog_search returning (same machinery)
    "q_index_corpus_stats",  # 3x; multi-commit stats lifecycle ~ q_index_sync + q_index_rebucket stay
    "q_index_decontaminate_slop",  # 2x (r12,r13); sloppy positional probe ~ q_index_phrase_slop stays
    # r15 rotation (the r14 verdict's #6 ask, same staleness
    # discipline): the full 25-query r8/r9-stale cohort RETURNS to the
    # window — 12 queries last driver-green in r8
    # (q11_important_stock, q16_supplier_count,
    # q_banded_cosine_near_dups, q_boilerplate, q_decontaminate,
    # q_event_paths, q_funnel_conversion, q_hashed_embeddings,
    # q_pack_windows, q_profile_orders, q_repetition_stats,
    # q_token_shards) and 13 in r9 (q18_large_orders,
    # q7_volume_shipping, q8_market_share, q_asof_forward_tolerance,
    # q_catalog_table_docs, q_cohort_retention, q_embedding_pool,
    # q_ivf_ann_topk, q_latest_event_per_user, q_merge_upsert,
    # q_pii_redact, q_simhash_near_dups, q_word_rarity — all removed
    # from this tuple above). Twenty-five multi-green shapes rotate
    # out in exchange, each freshly re-verified green in r14 and with
    # its plan shape still covered in-window or by the returning
    # cohort + dedicated tests. The r15-touched paths stay in-window
    # deliberately: q_index_sync / q_index_rebucket /
    # q_stream_plane_sync (the 32-core scaling work),
    # q_lsh_cosine_near_dups / q_semantic_dedup-adjacent shapes via
    # q_lsh_cosine_near_dups and q_ann_sync (the Arrow pair-cosine
    # kernel), q_ivf_two_level / q_ivf_probe_report (the Lloyd fold
    # fix's lifecycle).
    "q_order_parts_sorted",  # 7x; sorted-collect arrays ~ q_profile_orders returning + A2 parity
    "q_top_parts_by_revenue",  # 7x; join-agg-topk ~ q18_large_orders + q7_volume_shipping returning
    "q_sessionized_users",  # 7x; session windows ~ q_event_paths + q_funnel_conversion returning
    "q_stream_dedup",  # 7x; streaming dedup replay ~ q_stream_plane_sync stays + q_raw_file_docs stays
    "q_text_stats",  # 7x; text scalar expressions ~ q_repetition_stats + q_word_rarity returning
    "q_dedup_exact",  # 7x; exact-hash grouping ~ q_dup_clusters stays
    "q_minhash_near_dups",  # 7x; banded signature pairing ~ q_simhash_near_dups returning + minhash pytest suite
    "q_multimodal_features",  # 7x; Arrow binary plumbing pinned by the multimodal pytest suite; never perturbed
    "q_corpus_curation",  # 7x; composed curation ~ q_boilerplate + q_decontaminate returning (its components)
    "q_asof_join",  # 6x; asof ~ q_asof_forward_tolerance returning (tolerance superset)
    "q_uri_normalize",  # 6x; regex projection ~ q_pii_redact returning
    "q_time_functions",  # 6x; time scalars ~ q_cohort_retention + q_latest_event_per_user returning
    "q12_priority_by_returnflag",  # 5x; conditional agg ~ q11/q16/q18 returning TPC-H aggregates
    "q_approx_aggregates",  # 5x; sketch outputs pinned by local parity tests
    "q_range_join",  # 5x; range predicate join ~ q_interval_join stays
    "q_grouping_sets_revenue",  # 5x; multi-level agg ~ q16_supplier_count returning + rollup parity
    "q_multi_window_prices",  # 5x; stacked windows ~ q_latest_event_per_user + q_cohort_retention returning
    "q_lsh_ann_topk",  # 5x; LSH topk ~ q_ivf_ann_topk returning + q_lsh_cosine_near_dups stays
    "q_catalog_roundtrip_ids",  # 5x; catalog roundtrip ~ q_catalog_table_docs returning + q_catalog_search stays
    "q_catalog_partition_docs",  # 5x; catalog assembly ~ q_catalog_table_docs returning + q_catalog_search stays
    "q_time_travel",  # 5x; version-pinned read ~ q_index_time_travel stays + q_merge_upsert returning
    "q_snapshot_retention",  # 5x; retention/vacuum ~ lakehouse pytest suite + q_index_time_travel stays
    "q_stratified_sample",  # 4x; sampling ~ q_domain_mixture stays
    "q_doc_chunks",  # 4x; chunking ~ q_token_shards + q_pack_windows returning
    "q_jl_projection",  # 4x; projection folds ~ q_embedding_pool + q_hashed_embeddings returning
)

GATE_WINDOW = 50

# Queries whose builder performs eager side-effecting work — LakeTable
# commit cycles, streaming micro-batch replays, JDBC round trips —
# rather than returning one lazy Catalyst plan. Their bench timings
# measure an end-to-end stateful pipeline (multiple jobs + commit
# protocol), so bench.py subtotals them separately from the pure-plan
# queries: comparing a 2-commit ledger replay against a single
# aggregation scan round-over-round is comparing unlike things.
STATEFUL: frozenset[str] = frozenset(
    {
        "q_incremental_minhash",  # two LakeTable commit cycles vs a band ledger
        "q_incremental_semantic",  # two LakeTable commit cycles vs a vector ledger
        "q_persistent_ivf",  # IVF index build + MoR add + probed serve
        "q_ivf_quantized",  # IVF lifecycle + int8 candidate phase + exact rescore
        "q_filtered_ann",  # IVF lifecycle + filtered int8 serve
        "q_filtered_ann_per_query",  # IVF lifecycle + per-query-filtered serve, both paths
        "q_index_time_travel",  # two add commits + remove + version-pinned serve
        "q_raw_file_docs",  # full AvailableNow ingestion pipeline + ledger flatten
        "q_index_hybrid",  # both index lifecycles + fused two-modality serve
        "q_index_hybrid_filtered",  # both lifecycles + per-query-filtered fusion
        "q_index_rebucket",  # two add commits + full re-hash + serve
        "q_ivf_rebuild",  # build+MoR-add+remove+retrain commits, both paths
        "q_index_sync",  # table commits + CDF diff + index replace-add/remove
        "q_ann_sync",  # vector table commits + CDF diff + IVF merge/tombstone
        "q_ivf_recall",  # IVF lifecycle + probed AND full-probe serves
        "q_ivf_two_level",  # two-level build + CDF sync + full/partial/pinned serves
        "q_ivf_probe_report",  # build + probed-vs-live capacity report
        "q_postings_search",  # postings index: two add commits + bucket-pruned serve
        "q_index_corpus_stats",  # three add commits incl. re-add; cached-stats read
        "q_index_decontaminate",  # two add commits + phrase-probe decontamination
        "q_index_decontaminate_slop",  # two add commits + sloppy-phrase decontamination probe
        "q_index_phrase",  # positional index: two add commits + phrase serve
        "q_index_bm25_pruned",  # two add commits + max-score pruned BM25 serve (vs exact in-query)
        "q_skip_report",  # two add commits + maintain + per-layer skip observability
        "q_stream_plane_sync",  # two streamed windows: MERGE + dual CDF sync + pinned hybrid serve
        "q_index_phrase_slop",  # two add commits + sloppy-phrase serve
        "q_stream_near_dedup",  # two AvailableNow micro-batches through foreachBatch
        "q_stateful_running_status",  # applyInPandasWithState stream replay
        "q_merge_upsert",  # MERGE commit cycle
        "q_file_skipping",  # LakeTable commit + stats collection + pruned read
        "q_partition_evolution",  # three commit cycles incl. evolve + MERGE
        "q_mor_delete",  # three commit cycles incl. merge-on-read delete
        "q_mor_upsert",  # three commit cycles incl. two MoR appends
        "q_mor_upsert_partitioned",  # partitioned write + MoR append + restricted reads
        "q_mor_delete_by_key",  # partitioned write + tombstone append commits
        "q_shallow_clone",  # write + clone + divergent MERGE commits
    }
)


def _reorder() -> None:
    head = {k: v for k, v in QUERIES.items() if k not in DEMOTED}
    tail = {k: QUERIES[k] for k in DEMOTED if k in QUERIES}
    QUERIES.clear()
    QUERIES.update(head)
    QUERIES.update(tail)


_reorder()

__all__ = ["ORACLE", "QUERIES", "DEMOTED", "GATE_WINDOW", "STATEFUL"]
