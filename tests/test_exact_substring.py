"""Exact-substring dedup (Lee et al. 2022 style, operators/dedup.py):
planted verbatim spans must be detected at >= k tokens, shorter overlaps
and within-doc repeats must not, and the coverage statistic must match
hand-computed window counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_window_hashes_doubling_matches_bruteforce(spark):
    """The O(n log k) doubling construction must produce one hash per
    window position, equal windows -> equal hashes, and distinct
    windows -> distinct hashes (on this corpus)."""
    from solana_event_stream_spark.operators.dedup import (
        _window_hash_frame)

    docs = _mk_docs(spark, [
        (1, "a b c d e f g h"),
        (2, "x a b c d y"),       # contains the 4-window "a b c d"
        (3, "a b c"),             # shorter than k=4 -> empty
    ])
    out = {r.doc_id: r.wh for r in
           _window_hash_frame(docs, 4, distinct=False).collect()}
    assert len(out[1]) == 5      # 8 - 4 + 1 positions
    assert len(out[2]) == 3
    assert out[3] == []
    # doc2's window at position 1 is "a b c d" == doc1's position 0
    assert out[2][1] == out[1][0]
    # all other cross-doc windows differ
    assert len(set(out[1]) | set(out[2])) == 7   # 5 + 3 - 1 shared


def test_window_hashes_rejects_non_power_of_two(spark):
    from solana_event_stream_spark.operators.dedup import (
        _window_hash_frame)

    with pytest.raises(ValueError):
        _window_hash_frame(_mk_docs(spark, [(1, "a b c")]), 3)


def test_exact_substring_pairs_planted(spark):
    """Two docs sharing a verbatim 40-token span are a pair at k=32; a
    31-token overlap is NOT; a span repeated twice WITHIN one doc does
    not create a self-pair or inflate counts."""
    from solana_event_stream_spark.operators.dedup import (
        exact_substring_pairs)

    span40 = _words("s", 40)
    span31 = _words("t", 31)
    docs = _mk_docs(spark, [
        (1, _words("a", 20) + " " + span40 + " " + _words("b", 20)),
        (2, _words("c", 10) + " " + span40 + " " + _words("d", 30)),
        (3, _words("e", 25) + " " + span31 + " " + _words("f", 25)),
        (4, _words("g", 25) + " " + span31 + " " + _words("h", 25)),
        # doc 5 repeats ITS OWN 40-token span twice; shares nothing
        (5, span40.replace("s", "z") + " " + span40.replace("s", "z")),
    ])
    pairs = {(r.doc_a, r.doc_b): r.n_shared_windows
             for r in exact_substring_pairs(docs, k=32).collect()}
    assert (1, 2) in pairs
    # a 40-token shared span has 40 - 32 + 1 = 9 shared windows
    assert pairs[(1, 2)] == 9
    assert (3, 4) not in pairs          # 31 < k
    assert all(a != 5 and b != 5 for a, b in pairs)
    assert set(pairs) == {(1, 2)}


def test_exact_substring_coverage_golden(spark):
    """Hand-computed coverage: doc1 has 49 windows (80 tokens, k=32),
    9 of them duplicated (the 40-token span shared with doc2); doc3 is
    fully unique; a too-short doc reports 0 windows and NULL frac."""
    from solana_event_stream_spark.operators.dedup import (
        exact_substring_coverage)

    span40 = _words("s", 40)
    docs = _mk_docs(spark, [
        (1, _words("a", 20) + " " + span40 + " " + _words("b", 20)),
        (2, _words("c", 10) + " " + span40 + " " + _words("d", 30)),
        (3, _words("u", 80)),
        (4, _words("v", 10)),
    ])
    cov = {r.doc_id: r for r in
           exact_substring_coverage(docs, k=32).collect()}
    assert cov[1].n_windows == 49
    assert cov[1].n_dup_windows == 9
    assert abs(cov[1].dup_frac - 9 / 49) < 1e-12
    assert cov[3].n_dup_windows == 0 and cov[3].dup_frac == 0.0
    assert cov[4].n_windows == 0 and cov[4].dup_frac is None
    assert set(cov) == {1, 2, 3, 4}


def test_exact_substring_stop_window_cap(spark):
    """A window shared by more docs than max_docs_per_window is dropped
    from the PAIR list (boilerplate guard) while rarer windows still
    pair."""
    from solana_event_stream_spark.operators.dedup import (
        exact_substring_pairs)

    boiler = _words("bp", 32)            # shared by 5 docs
    rare = _words("r", 32)               # shared by 2 docs
    rows = [(i, boiler + " " + _words(f"x{i}_", 10)) for i in range(5)]
    rows += [(10, rare + " " + _words("p", 5)),
             (11, rare + " " + _words("q", 5))]
    docs = _mk_docs(spark, rows)
    pairs = {(r.doc_a, r.doc_b)
             for r in exact_substring_pairs(
                 docs, k=32, max_docs_per_window=4).collect()}
    assert pairs == {(10, 11)}


def test_exact_substring_plan_blocked_not_cross(spark):
    """The pair join must be an equi-join on the window hash — no
    cartesian product, no per-row Python."""
    from solana_event_stream_spark.operators.dedup import (
        exact_substring_pairs)

    docs = _mk_docs(spark, [(1, _words("a", 40)), (2, _words("b", 40))])
    plan = (exact_substring_pairs(docs, k=32)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_substring_survivors_apply_step(spark):
    """Docs over the coverage ceiling are dropped, everything else —
    including too-short docs — survives unchanged."""
    from solana_event_stream_spark.operators.dedup import (
        exact_substring_survivors)

    span40 = _words("s", 40)
    docs = _mk_docs(spark, [
        # 9/9 windows duplicated (the whole doc is the shared span+pad
        # shorter than another window) -> coverage 1.0 -> dropped
        (1, span40),
        (2, span40 + " " + _words("d", 60)),   # 9/69 ~ 0.13 -> kept
        (3, _words("u", 80)),                  # unique -> kept
        (4, _words("v", 10)),                  # too short -> kept
    ])
    kept = sorted(r.doc_id for r in
                  exact_substring_survivors(
                      docs, k=32, max_dup_frac=0.5).collect())
    assert kept == [2, 3, 4]


def test_winnowed_guarantee_alignment_free(spark):
    """Any shared span of >= k + w - 1 tokens must produce a shared
    winnowed fingerprint REGARDLESS of where the span sits in either
    doc (the Schleimer et al. guarantee); a fingerprint pair implies a
    genuine shared k-window (no false pairs across disjoint texts)."""
    from solana_event_stream_spark.operators.dedup import (
        exact_substring_pairs_winnowed)

    k, w = 8, 4
    span = _words("s", k + w - 1)        # exactly the guarantee floor
    rows = []
    # plant the same span at wildly different offsets in 4 docs
    for i, off in enumerate((0, 3, 11, 26)):
        rows.append((i, _words(f"pad{i}_", off) + (" " if off else "")
                     + span + " " + _words(f"tail{i}_", 7)))
    rows.append((50, _words("other", 40)))          # unrelated
    docs = _mk_docs(spark, rows)
    pairs = {(r.doc_a, r.doc_b) for r in
             exact_substring_pairs_winnowed(docs, k=k, w=w).collect()}
    import itertools
    assert set(itertools.combinations(range(4), 2)) <= pairs
    assert all(50 not in p for p in pairs)


def test_winnowed_volume_reduction(spark, sf_dir):
    """Winnowed fingerprints per doc must be a small fraction of the
    all-positions window count (~2/(w+1) expected; assert < 2x that
    bound on the real corpus)."""
    from pyspark.sql import functions as F

    from solana_event_stream_spark.operators.dedup import (
        _window_hash_frame, substring_fingerprint_frame)
    from solana_event_stream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    k, w = 16, 8
    n_all = (_window_hash_frame(docs, k, distinct=False)
             .agg(F.sum(F.size("wh"))).collect()[0][0])
    n_fp = (substring_fingerprint_frame(docs, k, w)
            .agg(F.sum(F.size("fps"))).collect()[0][0])
    assert n_fp > 0
    assert n_fp / n_all < 2 * (2 / (w + 1)), (n_fp, n_all)


def test_winnowed_fingerprints_subset_of_window_hashes(spark):
    """Every selected fingerprint IS one of the doc's window hashes
    (winnowing selects, never synthesizes)."""
    from solana_event_stream_spark.operators.dedup import (
        _window_hash_frame, substring_fingerprint_frame)

    docs = _mk_docs(spark, [(1, _words("a", 60)), (2, _words("b", 35))])
    wh = {r.doc_id: set(r.wh) for r in
          _window_hash_frame(docs, 8, distinct=False).collect()}
    fps = {r.doc_id: set(r.fps) for r in
           substring_fingerprint_frame(docs, 8, 5).collect()}
    for d in wh:
        assert fps[d] <= wh[d]
        assert fps[d]


def test_survivors_plan_time_bounded_at_deployment_geometry(spark):
    """r14 planning trap regression gate: carrying size(chain_col)
    beside explode(chain_col) over the 9-level staged fingerprint
    chain made PhysicalOperation's alias inlining exponential —
    substring_incremental_survivors took 145 s of pure PLAN time at
    k=32/w=16 over a parquet scan (1.6 s with the count derived
    post-explode). Gate: plan construction at deployment geometry
    stays bounded. The bound is generous (steal-safe); the broken
    shape exceeds it by ~5x."""
    import time

    from solana_event_stream_spark.operators.dedup import (
        substring_incremental_survivors)

    seen = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))
    batch = _mk_docs(spark, [(9_000_000 + i, _words(f"b{i}_", 60))
                             for i in range(5)])
    t0 = time.perf_counter()
    df = substring_incremental_survivors(batch, seen, k=32, w=16)
    df._jdf.queryExecution().executedPlan()
    assert time.perf_counter() - t0 < 30, "staged-chain planning blowup"
    assert df.count() == 5   # nothing shared with the corpus
