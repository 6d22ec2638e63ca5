"""Int8 embedding quantization (operators/similarity.py): exact
round-trip bounds, scale invariance of the quantized cosine, and the
recall differential of the quantized brute-force top-k vs the exact
catalog form on the real corpus."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quantize_roundtrip_bounds(spark):
    """Every dequantized element must sit within scale/254 of the
    original (symmetric round-to-nearest at 127 steps); zero vectors
    round-trip to zeros."""
    from solana_event_stream_spark.operators.similarity import (
        dequantize_embeddings_int8, quantize_embeddings_int8)

    rows = [(1, [0.5, -1.0, 0.25, 0.0]),
            (2, [3.0, 2.9999, -3.0, 1.5]),
            (3, [0.0, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings_int8(emb)
    back = {r.vec_id: r.embedding
            for r in dequantize_embeddings_int8(q).collect()}
    for vid, vec in rows:
        scale = max(abs(v) for v in vec)
        for orig, rt in zip(vec, back[vid]):
            assert abs(orig - rt) <= (scale / 254 + 1e-12), (vid, orig, rt)
    assert back[3] == [0.0, 0.0, 0.0, 0.0]
    codes = {r.vec_id: r.q for r in q.collect()}
    assert max(abs(c) for c in codes[2]) == 127   # scale maps to +/-127


def test_quantized_topk_recall_on_corpus(spark, sf_dir):
    """recall@k of the int8 brute-force top-k vs the exact catalog
    form must be high (~1/254 per-element noise barely perturbs
    cosine ranks): >= 0.9 overall on the real corpus."""
    from solana_event_stream_spark.operators.similarity import (
        ann_cosine_topk, ann_cosine_topk_quantized)

    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    quant = {}
    for r in ann_cosine_topk_quantized(spark, sf_dir).collect():
        quant.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(quant) == set(exact)
    hits = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.9, (hits, total)


def test_quantized_plan_no_udf_no_cross(spark, sf_dir):
    from solana_event_stream_spark.operators.similarity import (
        ann_cosine_topk_quantized)

    plan = (ann_cosine_topk_quantized(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
