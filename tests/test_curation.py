"""Semantics tests for operators/curation.py (decontamination, k-means,
SemDeDup, shard assignment) — planted-case checks that the oracle-parity
gate (test_queries_oracle) can't express: the oracle proves Spark ==
DuckDB; these prove both compute the RIGHT thing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solana_event_stream_spark.operators.curation import (
    KM_ITERS, _assign, decontaminate, kmeans_assign, semdedup_flags,
)
from solana_event_stream_spark.operators.training_data import (
    shard_assignment_stats,
)
from solana_event_stream_spark.tables import load_spread


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string")


def test_decontaminate_flags_planted_overlap(spark):
    # doc 0 -> eval split (0 % 37 == 0). doc 1 copies 4 consecutive
    # words from it; doc 2 is disjoint; doc 3 is a verbatim copy.
    eval_text = "alpha beta gamma delta epsilon zeta"
    docs = _docs(spark, [
        (0, "en", eval_text),
        (1, "en", "xx yy beta gamma delta epsilon zz"),
        (2, "en", "one two three four five six seven"),
        (3, "en", eval_text),
    ])
    out = {(r.part, r.lang): r for r in decontaminate(docs).collect()}
    ng, ex = out[("ngram", "en")], out[("exact", "en")]
    assert ng.n_train == 3
    assert ng.n_flagged == 2          # docs 1 and 3
    assert ex.n_flagged == 1          # doc 3 only
    assert ex.rate == pytest.approx(1 / 3)


def test_decontaminate_short_docs_produce_no_grams(spark):
    # < NGRAM words on either side: the guarded gram builder must not
    # emit a descending-sequence artifact (Spark sequence(1, 0) is
    # DESCENDING) and short docs can never collide.
    docs = _docs(spark, [
        (0, "en", "alpha beta"),              # eval, 2 words
        (1, "en", "alpha beta"),              # train, identical 2 words
    ])
    out = {(r.part, r.lang): r for r in decontaminate(docs).collect()}
    assert out[("ngram", "en")].n_flagged == 0   # no 4-grams exist
    assert out[("exact", "en")].n_flagged == 1   # exact hash still hits


def test_kmeans_inertia_monotone_under_iterations(spark, sf_dir):
    emb = load_spread(spark, sf_dir, "embeddings")
    inertia = []
    for iters in (0, 1, KM_ITERS):
        assigned = kmeans_assign(emb, iters=iters)
        inertia.append(
            assigned.agg(F.sum("dist").alias("s")).collect()[0].s)
    assert inertia[1] <= inertia[0] + 1e-9
    assert inertia[2] <= inertia[1] + 1e-9
    assert inertia[2] < inertia[0]  # it actually moved


def test_kmeans_assign_covers_corpus_exactly_once(spark, sf_dir):
    emb = load_spread(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert assigned.filter(
        (F.col("cluster") < 0) | (F.col("cluster") >= 8)).count() == 0


def test_assign_tie_break_prefers_smaller_cluster(spark):
    # Two identical centroids: every vector ties; the fold's strict <
    # must keep cluster 0 (matching ROW_NUMBER ORDER BY dist, cluster).
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<float>")
    cents = {0: [0.0, 0.0], 1: [0.0, 0.0]}
    rows = _assign(emb, cents).collect()
    assert all(r.cluster == 0 for r in rows)


def test_semdedup_drops_later_twin_keeps_earlier(spark):
    # vec 5 is a near-copy of vec 1 (same cluster): 5 dropped, 1 kept.
    # vec 9 is its own cluster: kept. Cross-cluster twins never compare.
    base = [1.0] * 4
    rows = [
        (1, base, 0, 0.0),
        (5, [1.0, 1.0, 1.0, 1.001], 0, 0.0),
        (7, [-1.0, 1.0, -1.0, 1.0], 0, 0.0),   # orthogonal-ish, kept
        (9, base, 1, 0.0),                      # other cluster, kept
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster int, "
              "dist double")
    flags = {r.vec_id: r.dropped
             for r in semdedup_flags(assigned, tau=0.95).collect()}
    assert flags == {1: False, 5: True, 7: False, 9: False}


def test_shard_assignment_balanced_and_deterministic(spark, sf_dir):
    a = shard_assignment_stats(spark, sf_dir).collect()
    b = shard_assignment_stats(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    shares = {r.shard: r.share for r in a}
    assert abs(sum(shares.values()) - 1.0) < 1e-9
    # md5 is uniform: with 500 docs over 16 shards no shard should be
    # pathologically empty or dominant
    assert len(shares) == 16
    assert max(shares.values()) < 0.25
