"""Every rows-only registered query (oracle=None) must have an
oracle-exact TWIN registered — the invariant VERDICT r2 asked to be
enforced rather than asserted in docs. A rows-only check only proves
the query runs; its twin proves the same operator computes exactly
(streaming ops get batch twins, approx/engine-native ops get
deterministic exact formulations)."""

from etlalchemy_spark.registry import all_queries

# rows-only query -> its oracle-exact twin (same operator, exact
# formulation). Adding a new rows-only query without extending this
# map fails the test below.
EXACT_TWINS = {
    # agg_approx_count_distinct / agg_approx_quantiles left this map
    # in r13: they became bounded-error ORACLE gates (the exact anchor
    # plus within-bound flags hash-match DuckDB), no twin needed.
    "dedup_embedding_cosine": "dedup_embedding_cosine_exact",
    "dedup_minhash_cc_pipeline": "dedup_minhash_cc_exact",
    "dedup_minhash_lsh": "dedup_minhash_lsh_exact",
    "sim_cosine_topk_lsh": "sim_cosine_topk_lsh_exact",
    "sim_cosine_topk_lsh_multiprobe": "sim_cosine_topk_lsh_multiprobe_exact",
    "sim_ivf_kmeans_topk": "sim_ivf_topk_exact",
    "sim_pq_adc_topk": "sim_pq_codes_exact",
    "sim_ivf_topk": "sim_ivf_topk_exact",
    "sketch_hll_cross_table_union": "sketch_hll_portable_registers",
    "sketch_hll_distinct_customers": "sketch_hll_portable_estimate",
    "stream_ab_srm_monitor": "sample_ab_assignment",
    "stream_decontam_scrub": "text_decontamination",
    "stream_dedup_watermark": "dedup_exact_first_per_key",
    "stream_foreach_batch_sink": "events_tumbling_1h",
    "stream_incremental_ann_index": "sim_incremental_index_topk",
    "stream_incremental_dedup": "dedup_minhash_lsh_exact",
    "stream_semantic_incremental": "dedup_semantic_incremental",
    "stream_session_window": "events_session_window",
    "stream_sliding_counts": "events_sliding_1h_15m",
    "stream_stateful_user_counts": "events_power_users_p95",
    "stream_static_enrich": "events_user_enrich",
    "stream_stream_join": "events_click_view_attrib",
    "stream_pyds_replay_tumbling": "events_tumbling_1h",
    "stream_tumbling_counts": "events_tumbling_1h",
    "stream_tws_running_totals": "events_power_users_p95",
    "text_bpe_train": "text_bpe_pair_counts",
}


def test_every_rows_only_query_has_an_exact_twin():
    qs = all_queries()
    rows_only = {n for n, q in qs.items() if q.oracle is None}
    unmapped = rows_only - set(EXACT_TWINS)
    assert not unmapped, f"rows-only queries without a declared exact twin: {sorted(unmapped)}"
    stale = set(EXACT_TWINS) - rows_only
    assert not stale, f"twin map entries that are no longer rows-only: {sorted(stale)}"
    for name, twin in EXACT_TWINS.items():
        assert twin in qs, f"twin {twin} (for {name}) is not registered"
        assert qs[twin].oracle is not None, f"twin {twin} (for {name}) has no oracle"
