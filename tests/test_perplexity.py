"""CCNet-style bigram-LM perplexity filter (operators/text_analysis.py):
hand-computed smoothed probabilities on a planted reference, OOV
floors, and the apply-step ordering property (in-domain text scores
lower perplexity than shuffled/garbage text)."""

from __future__ import annotations

import math


def _mk(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_bigram_lm_golden_probs(spark):
    """Reference 'a b a b a c': V=3; c(a)=3, c(a,b)=2, c(a,c)=1;
    add-1: p(b|a) = (2+1)/(3+3) = 0.5, p(c|a) = (1+1)/(3+3) = 1/3."""
    from solana_event_stream_spark.operators.text_analysis import (
        train_bigram_lm)

    lm = {(r.w1, r.w2): r.logp for r in
          train_bigram_lm(_mk(spark, [(1, "a b a b a c")])).collect()}
    assert abs(lm[("a", "b")] - math.log(0.5)) < 1e-12
    assert abs(lm[("a", "c")] - math.log(1 / 3)) < 1e-12
    # c(b)=2, c(b,a)=2 -> p(a|b) = 3/5
    assert abs(lm[("b", "a")] - math.log(3 / 5)) < 1e-12
    assert set(lm) == {("a", "b"), ("a", "c"), ("b", "a")}


def test_perplexity_scores_and_oov_floor(spark):
    """A doc made of reference bigrams scores exp(-avg logp) exactly;
    a doc of entirely unseen words takes the -ln(V) OOV floor per
    bigram; a one-word doc carries NULL scores."""
    from solana_event_stream_spark.operators.text_analysis import (
        score_perplexity, train_bigram_lm)

    ref = _mk(spark, [(1, "a b a b a c")])
    lm = train_bigram_lm(ref)
    docs = _mk(spark, [(10, "a b a c"),      # bigrams ab, ba, ac
                       (20, "x y z"),        # all OOV
                       (30, "solo")])
    got = {r.doc_id: r for r in score_perplexity(docs, lm).collect()}
    want_avg = (math.log(0.5) + math.log(3 / 5) + math.log(1 / 3)) / 3
    assert abs(got[10].avg_logp - want_avg) < 1e-12
    assert abs(got[10].perplexity - math.exp(-want_avg)) < 1e-12
    # V = 3 -> OOV floor -ln(3) per bigram -> perplexity exactly 3
    assert abs(got[20].perplexity - 3.0) < 1e-9
    assert got[30].n_bigrams == 0 and got[30].perplexity is None


def test_perplexity_filter_orders_in_domain_first(spark):
    """On the synthetic corpus: a verbatim in-domain doc must score
    LOWER perplexity than its word-shuffled copy and than random-vocab
    garbage; the apply step keeps the in-domain doc and drops garbage
    at a threshold between them."""
    from solana_event_stream_spark.operators.text_analysis import (
        perplexity_filter, score_perplexity, train_bigram_lm)
    from solana_event_stream_spark.tables import load_table

    ref = (load_table(spark, "/root/testdata/sf0.001", "documents")
           .select("doc_id", "text").limit(300))
    sample = ref.limit(1).collect()[0].text
    words = sample.split(" ")
    shuffled = " ".join(words[::-1])
    garbage = " ".join(f"zq{i}w" for i in range(len(words)))
    docs = _mk(spark, [(1, sample), (2, shuffled), (3, garbage)])
    lm = train_bigram_lm(ref)
    got = {r.doc_id: r.perplexity
           for r in score_perplexity(docs, lm).collect()}
    assert got[1] < got[2] < got[3]
    kept = {r.doc_id for r in perplexity_filter(
        docs, ref, max_perplexity=(got[1] + got[3]) / 2).collect()}
    assert 1 in kept and 3 not in kept


def test_perplexity_plan_broadcast_no_udf(spark):
    """The scoring join must broadcast the LM side; no per-row Python,
    no cartesian."""
    from solana_event_stream_spark.operators.text_analysis import (
        score_perplexity, train_bigram_lm)

    ref = _mk(spark, [(1, "a b c d e f g h")])
    docs = _mk(spark, [(1, "a b c")])
    plan = (score_perplexity(docs, train_bigram_lm(ref))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan


def test_perplexity_gate_plans_with_zero_actions(spark, monkeypatch):
    """VERDICT r13 item 2: the default-args perplexity gate must plan
    WITHOUT driver-side actions — V is pinned in the LM ('v' column)
    and folds into the scoring plan as a one-row broadcast. Enforced
    by making every DataFrame action explode during construction of
    the full build_training_corpus perplexity path."""
    from pyspark.sql import DataFrame

    from solana_event_stream_spark.operators.text_analysis import (
        perplexity_filter, score_perplexity, train_bigram_lm)
    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)

    ref = _mk(spark, [(1, "a b a b a c"), (2, "b a c a b a")])
    docs = spark.createDataFrame(
        [(10, "en", "a b a c a b a b a c b a"),
         (20, "en", "x y z q w e r t y u i o")],
        "doc_id long, lang string, text string")

    def _boom(self, *a, **k):
        raise AssertionError("pre-query action fired on the "
                             "default-args perplexity gate path")

    with monkeypatch.context() as m:
        for action in ("count", "collect", "toLocalIterator", "head"):
            m.setattr(DataFrame, action, _boom)
        lm = train_bigram_lm(ref)
        scored = score_perplexity(docs.select("doc_id", "text"), lm)
        filtered = perplexity_filter(docs, ref, max_perplexity=1e9)
        piped = build_training_corpus(
            docs, dedup=False, min_words=1, min_stop_ratio=0.0,
            min_unique_ratio=0.0, max_top2gram_frac=1.0,
            max_dup3gram_frac=1.0, reference_docs=ref,
            max_perplexity=1e9)
    # outside the patch the plans execute and are correct
    assert {r.doc_id for r in scored.collect()} == {10, 20}
    assert {r.doc_id for r in filtered.collect()} == {10, 20}
    assert {r.doc_id for r in piped.collect()} == {10, 20}
    # and the pinned-V scores equal the explicit-vocab_size form
    import math
    explicit = {r.doc_id: r.perplexity for r in score_perplexity(
        docs.select("doc_id", "text"), lm, vocab_size=3).collect()}
    pinned = {r.doc_id: r.perplexity for r in scored.collect()}
    for k in pinned:
        assert abs(pinned[k] - explicit[k]) < 1e-12
