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
