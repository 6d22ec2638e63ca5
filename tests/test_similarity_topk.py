"""Equivalence guard for the bounded two-phase ANN top-k reduce:
on any scored candidate set it must return exactly the rows (and ranks)
of the naive single-window form it replaced."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _naive_topk(scored, k):
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def test_two_phase_topk_matches_naive(spark):
    from solana_event_stream_spark.operators.similarity import (
        TOP_K, _topk_per_query)

    # Deterministic synthetic candidate set: 7 queries x 400 candidates,
    # hash-derived scores with exact ties (score quantized to 1/32) so
    # the neighbor_id tie-break is exercised, plus queries with fewer
    # than TOP_K candidates.
    scored = (spark.range(7 * 400)
              .select((F.col("id") % 7).alias("query_id"),
                      (F.col("id") / 7).cast("long").alias("neighbor_id"))
              .filter(  # query 6 keeps only 2 candidates
                  (F.col("query_id") != 6) | (F.col("neighbor_id") < 2))
              .withColumn(
                  "cosine",
                  (F.floor(F.pmod(F.xxhash64("query_id", "neighbor_id"),
                                  F.lit(32))) / F.lit(32.0))))

    got = sorted(map(tuple, _topk_per_query(scored).collect()))
    want = sorted(map(tuple, _naive_topk(scored, TOP_K).collect()))
    assert got == want
    # sanity: ties actually occurred (quantized scores guarantee it)
    per_q = {}
    for qid, _nid, cos, _rk in want:
        per_q.setdefault(qid, []).append(cos)
    assert any(len(set(v)) < len(v) for v in per_q.values())


def test_ivf_nprobe_recall_monotone_and_exact_at_full_probe(spark):
    """The nprobe knob must behave like a real IVF index: recall vs the
    brute-force ground truth is monotone in nprobe, and probing every
    cell degenerates to the exact result."""
    from solana_event_stream_spark.operators.similarity import (
        IVF_K, ann_cosine_topk, ann_ivf_topk, ann_ivf_topk_probed)
    sf = "/root/testdata/sf0.001"

    def result_set(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    truth = result_set(ann_cosine_topk(spark, sf))

    def recall(pairs):
        return len(pairs & truth) / len(truth)

    r1 = recall(result_set(ann_ivf_topk(spark, sf)))
    r1p = recall(result_set(ann_ivf_topk_probed(spark, sf, nprobe=1)))
    r2 = recall(result_set(ann_ivf_topk_probed(spark, sf, nprobe=2)))
    rfull = result_set(ann_ivf_topk_probed(spark, sf, nprobe=IVF_K))

    assert r1p == r1            # nprobe=1 == the argmax single-cell form
    assert r2 >= r1             # more probes never lose recall
    assert rfull == truth       # probing all cells == exact brute force


def test_ivf_probed_assignment_stays_narrow(spark):
    """The probe-cell computation must keep the zero-exchange shape of
    the nprobe=1 assignment: no Window, no cross join."""
    import io
    from contextlib import redirect_stdout
    from solana_event_stream_spark.operators.similarity import (
        ann_ivf_topk_probed)
    df = ann_ivf_topk_probed(spark, "/root/testdata/sf0.001", nprobe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "Cross" not in plan
