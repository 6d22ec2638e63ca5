"""Gopher-style repetition filters (text_battery 'repetition' part,
r12): planted-case goldens — hand-computed duplicate-word and
duplicate-n-gram statistics."""

from __future__ import annotations


def test_repetition_planted_goldens(spark, tmp_path):
    from solana_event_stream_spark.operators.text_analysis import (
        text_repetition)

    docs = spark.createDataFrame([
        (1, "en", "a a a a"),        # total repetition
        (2, "en", "x y z"),          # zero repetition
        (3, "en", "solo"),           # too short for any n-gram
        (4, "en", "p q p q p"),      # "p q"x2 + "q p"x2 of 4 2-grams
    ], "doc_id long, lang string, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in
           text_repetition(spark, str(tmp_path)).collect()}

    r1 = got[1]
    assert (r1.n_words, r1.n_distinct_words) == (4, 1)
    assert r1.dup_word_frac == 0.75
    assert (r1.n2grams, r1.top2_n, r1.dup2_n) == (3, 3, 3)
    assert r1.top2_frac == 1.0 and r1.dup2_frac == 1.0
    assert (r1.n3grams, r1.top3_n, r1.dup3_n) == (2, 2, 2)

    r2 = got[2]
    assert r2.dup_word_frac == 0.0
    assert (r2.n2grams, r2.top2_n, r2.dup2_n) == (2, 1, 0)
    assert (r2.n3grams, r2.top3_n, r2.dup3_n) == (1, 1, 0)
    assert r2.top3_frac == 1.0 and r2.dup3_frac == 0.0

    r3 = got[3]
    assert (r3.n_words, r3.n2grams, r3.top2_frac) == (1, None, None)

    r4 = got[4]
    assert (r4.n_words, r4.n_distinct_words) == (5, 2)
    assert (r4.n2grams, r4.top2_n, r4.dup2_n) == (4, 2, 4)
    assert r4.dup2_frac == 1.0
    # 3-grams: "p q p"x2, "q p q"x1 -> 3 grams, top 2, dup 2
    assert (r4.n3grams, r4.top3_n, r4.dup3_n) == (3, 2, 2)


def test_hashed_tallies_match_string_reference(spark, sf_dir):
    """r13: the shipped hashed-gram tallies (long sort keys, xxhash64
    gram chain, hash-based distinct) must produce IDENTICAL counts to
    the exact string-gram reference form on the full test corpus —
    the differential that bounds the documented 64-bit collision
    caveat at a measured zero on every SF the driver checks."""
    from pyspark.sql import functions as F

    from solana_event_stream_spark.operators.text_analysis import (
        _rep_gram_hashes, _rep_grams, _run_length_tally, _word_hashes)
    from solana_event_stream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    want = {r.doc_id: (r.nd, r.t2, r.t3) for r in docs.select(
        "doc_id",
        F.size(F.array_distinct(w)).alias("nd"),
        _run_length_tally(_rep_grams(w, 2)).alias("t2"),
        _run_length_tally(_rep_grams(w, 3)).alias("t3")).collect()}
    hashed = docs.select("doc_id", _word_hashes(w).alias("hw"))
    got = {r.doc_id: (r.nd, r.t2, r.t3) for r in hashed.select(
        "doc_id",
        F.size(F.array_distinct("hw")).alias("nd"),
        _run_length_tally(_rep_gram_hashes(F.col("hw"), 2), "long")
        .alias("t2"),
        _run_length_tally(_rep_gram_hashes(F.col("hw"), 3), "long")
        .alias("t3")).collect()}
    assert got == want


def test_repetition_plan_single_hash_pass_no_exchange(spark, sf_dir):
    """The word-hash array must be computed ONCE per row (the stacked
    projections must not collapse into per-reference copies of the
    transform), the 2-gram hash array must be built ONCE (the 3-gram
    chain reuses it), and the whole operator stays narrow — no keyed
    exchange, no generate. The only permitted exchange is the
    conditional load_spread round-robin rebalance (fires here because
    the test corpus is a single split; a no-op at warehouse scale)."""
    from solana_event_stream_spark.operators.text_analysis import (
        text_repetition)

    plan = (text_repetition(spark, sf_dir)
            ._jdf.queryExecution().optimizedPlan().toString())
    # ONE split and ONE word-hash transform in the whole plan: had the
    # stacked projections collapsed, every reference to hw would carry
    # its own transform(split(text)) copy
    assert plan.count("split(text") == 1, plan
    assert plan.count("transform(") == 1, plan
    # ONE 2-gram zip_with over hw (slices 1 and 2): the 3-gram build
    # must chain from g2, not re-derive the pair hashes
    assert plan.count("zip_with(slice") == 2, plan  # g2 + the g3 chain
    executed = (text_repetition(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
    for line in executed.splitlines():
        if "Exchange" in line:
            assert "roundrobin" in line.lower(), line
    assert "hashpartitioning" not in executed
    assert "Generate" not in executed


def test_battery_fused_two_scans(spark, sf_dir):
    """r13 fused battery: the six parts must cost TWO corpus scans
    (per-doc parts fused over one staged chain + one multi-part melt;
    rollup parts pre-agg through one explode + ONE groupBy whose tiny
    result is cached for the three part selections) — not six union
    branches each re-scanning the table."""
    from solana_event_stream_spark.catalog import release_persisted
    from solana_event_stream_spark.operators.text_analysis import (
        text_battery)

    df = text_battery(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    lines = executed.splitlines()
    n_fs = sum("FileScan" in ln for ln in lines)
    n_imr = sum("InMemoryRelation" in ln for ln in lines)
    n_imts = sum("InMemoryTableScan" in ln for ln in lines)
    # the three rollup parts read the cached aggregate, not the corpus
    assert n_imts == 3, executed
    # plan TEXT renders the cached subtree (whose single FileScan is
    # the rollup subplan's ONE corpus scan) under every
    # InMemoryTableScan — same plan_id, one physical scan — so each
    # InMemoryRelation print accounts for one FileScan string. The
    # remainder is the uncached scans: exactly ONE (the per-doc
    # subplan). More means a union branch re-reads the corpus.
    assert n_fs - n_imr == 1, executed
    release_persisted()
