"""Guard against silent catalog drift.

The driver's CORRECTNESS harness records at most 50 queries
(alphabetical), so the catalog must stay at <= 50 entries AND exactly
match this committed list — a consolidation that drops or renames an
entry (the way q17 was silently un-registered in round 4) fails here
instead of slipping through unverified.
"""

from __future__ import annotations

from solana_event_stream_spark.catalog import load_catalog

DRIVER_CORRECTNESS_CAP = 50

# The committed registry: every catalog entry, by exact name.
EXPECTED_NAMES = {
    "account_events_by_type",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "corpus_decontaminate",
    "customer_set_ops",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dex_enrichment_flags",
    "dex_event_ordering",
    "dex_events_by_type",
    "dex_pipeline_throughput",
    "dex_swap_data_join",
    "dex_system_transfers",
    "dex_trade_volume_by_mint",
    "domain_mix_resample",
    "embedding_curation",
    "events_asof_join",
    "events_counts_battery",
    "events_high_value_outliers",
    "events_profile_battery",
    "events_sessionization",
    "events_time_rollup",
    "events_type_share_pivot",
    "events_user_running_sum",
    "events_value_band_join",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_metadata_extract",
    "multimodal_resize",
    "nation_rollup_coverage",
    "pack_sequences",
    "pubkey_short_by_mint",
    "q10_returned_items",
    "q13_customer_distribution",
    "q1719_bracket_predicates",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4614_selective_aggregates",
    "q578_nation_trade_flows",
    "rank_topk_battery",
    "text_battery",
    "training_sample_filter",
}

# Entries with no DuckDB oracle BY DESIGN (driver records rows-only).
# Anything else missing an oracle is a regression.
ROWS_ONLY_OK = {"dex_pipeline_throughput"}


def test_catalog_exactly_matches_committed_list():
    cat = load_catalog()
    assert set(cat) == EXPECTED_NAMES, (
        f"added: {sorted(set(cat) - EXPECTED_NAMES)}; "
        f"dropped: {sorted(EXPECTED_NAMES - set(cat))} — update "
        "EXPECTED_NAMES deliberately, never implicitly")


def test_catalog_fits_driver_window():
    cat = load_catalog()
    assert len(cat) <= DRIVER_CORRECTNESS_CAP


def test_every_entry_has_oracle_or_explicit_rows_only_tag():
    cat = load_catalog()
    missing = {n for n, s in cat.items()
               if s.oracle is None and n not in ROWS_ONLY_OK}
    assert not missing, (
        f"{sorted(missing)} have no oracle and no rows-only exemption")


def test_tracked_persist_released_on_next_query(spark, sf_dir):
    """ADVICE r10: caches persisted inside a catalog query (the rollup's
    5-min partials, curation's assignment frame) must not accumulate
    across invocations — the next top-level catalog call releases them."""
    from solana_event_stream_spark import catalog as cat_mod

    cat = cat_mod.load_catalog()
    cat_mod.release_persisted()
    df = cat["events_time_rollup"].spark_fn(spark, sf_dir)
    df.collect()
    assert len(cat_mod._ALL_PERSISTS) == 1
    (cached,) = cat_mod._ALL_PERSISTS.values()
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    cat["events_counts_battery"].spark_fn(spark, sf_dir)  # build only
    assert cat_mod._ALL_PERSISTS == {}
    assert not (cached.storageLevel.useMemory
                or cached.storageLevel.useDisk)


def test_tracked_persist_is_thread_scoped(spark, sf_dir):
    """ADVICE r12: a top-level catalog query on thread B must NOT
    release a cache thread A's query enrolled — per-thread tracking,
    not just a lock around a global list. Thread A's OWN next
    top-level query still drains it (the intended cross-query
    release), and the global teardown drain sees every thread."""
    import threading

    from solana_event_stream_spark import catalog as cat_mod

    cat = cat_mod.load_catalog()
    cat_mod.release_persisted()

    def run_a():
        cat["events_time_rollup"].spark_fn(spark, sf_dir).collect()

    ta = threading.Thread(target=run_a)
    ta.start()
    ta.join()
    (cached,) = cat_mod._ALL_PERSISTS.values()
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    # a DIFFERENT thread (this one) running a top-level query leaves
    # thread A's cache alone
    cat["events_counts_battery"].spark_fn(spark, sf_dir)
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    assert id(cached) in cat_mod._ALL_PERSISTS
    # global teardown drain releases across threads
    assert cat_mod.release_persisted() >= 1
    assert not (cached.storageLevel.useMemory
                or cached.storageLevel.useDisk)
    assert cat_mod._ALL_PERSISTS == {}
