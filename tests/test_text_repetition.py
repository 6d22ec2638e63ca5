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
