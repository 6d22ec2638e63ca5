"""Unit tests for the training-data operators (dedup clustering,
sampling, packing, quality chain, domain mixing).

Oracle parity for all of these is covered by test_queries_oracle
(catalog-driven); these tests pin the operator *semantics* on small
hand-built inputs where the expected answer is obvious.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from solana_event_stream_spark.catalog import load_catalog
from solana_event_stream_spark.operators.dedup import connected_components

CATALOG = load_catalog()


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3 plus island 10-11: min-label must propagate two hops.
    pairs = spark.createDataFrame(
        [Row(doc_a=2, doc_b=3), Row(doc_a=1, doc_b=2),
         Row(doc_a=10, doc_b=11)])
    got = {r.doc_id: r.cluster_id
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_multi_round(spark):
    # chain 1-2-3-4-5-6: the min label needs FIVE propagation hops to
    # reach the far end, so the two-hop-batched loop (r19) must run
    # multiple materialized rounds AND its chg2-only convergence rule
    # must not stop early when hop 1 of a round changes but hop 2
    # confirms (the 3-node chain in the test above converges in one
    # round; this one cannot).
    pairs = spark.createDataFrame(
        [Row(doc_a=a, doc_b=a + 1) for a in range(1, 6)])
    got = {r.doc_id: r.cluster_id
           for r in connected_components(pairs).collect()}
    assert got == {d: 1 for d in range(1, 7)}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert connected_components(pairs).count() == 0


def test_dedup_clusters_keeper_per_cluster(spark, sf_dir):
    from solana_event_stream_spark.operators.dedup import docs_with_dups
    out = CATALOG["dedup_clusters"].spark_fn(spark, sf_dir).collect()
    assert len(out) > 0
    words = {r.doc_id: r.nw for r in
             docs_with_dups(spark, sf_dir)
             .select("doc_id", F.size(F.split("text", " ")).alias("nw"))
             .collect()}
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        keepers = [r for r in rows if r.keep]
        assert len(keepers) == 1, f"cluster {cid}: {len(keepers)} keepers"
        assert keepers[0].doc_id == min(r.doc_id for r in rows) == cid
        assert all(r.cluster_size == len(rows) for r in rows)
        assert len(rows) >= 2  # singletons never enter the edge set
        # quality-keeper column (r15): exactly one per cluster — the
        # max-word-count member, ties broken by min doc_id
        qk = [r for r in rows if r.keep_by_words]
        assert len(qk) == 1, f"cluster {cid}: {len(qk)} word-keepers"
        best = max(words[r.doc_id] for r in rows)
        cands = sorted(r.doc_id for r in rows
                       if words[r.doc_id] == best)
        assert qk[0].doc_id == cands[0]


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from solana_event_stream_spark.operators.training_data import (
        sample_stratified_hash)
    fn = sample_stratified_hash
    a = {r.lang: r for r in fn(spark, sf_dir).collect()}
    b = {r.lang: r for r in fn(spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    for lang, r in a.items():
        assert r.n_kept == b[lang].n_kept  # deterministic draw
        assert 0 <= r.n_kept <= r.n_total
        assert abs(r.realized_rate - r.n_kept / r.n_total) < 1e-12


def test_pack_sequences_budget_and_coverage(spark, sf_dir):
    from solana_event_stream_spark.operators.training_data import (
        _CHUNK_MAX, _CHUNK_OVERLAP, chunk_documents)
    from solana_event_stream_spark.tables import load_table
    rows = CATALOG["pack_sequences"].spark_fn(spark, sf_dir).collect()
    packs = [r for r in rows if r.part == "pack"]
    cps = [r for r in rows if r.part == "chunkpack"]
    assert packs and cps and len(packs) + len(cps) == len(rows)
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert sum(p.tok for p in packs) == total_tokens
    # contiguous fill: every pack except a bucket's last starts within
    # budget of its predecessor => pack_seq values per bucket are dense.
    by_bucket = {}
    for p in packs:
        by_bucket.setdefault(p.k1, []).append(p.k2)
    for bucket, seqs in by_bucket.items():
        seqs = sorted(seqs)
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))
        assert seqs[0] == 0
    # chunkpack part: chunk totals carry the overlap tax — per-bucket
    # chunk counts and token sums must equal a direct chunk_documents
    # run, and pack counts never exceed chunk counts
    chunks = chunk_documents(docs.select("doc_id", "text"),
                             max_tokens=_CHUNK_MAX,
                             overlap=_CHUNK_OVERLAP)
    want = {r.bucket: (r.n, r.tok) for r in
            chunks.withColumn("bucket", F.col("doc_id") % 32)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_tokens").alias("tok")).collect()}
    for r in cps:
        assert (r.n, r.tok) == want[r.k1]
        assert 1 <= r.k2 <= r.n


def test_quality_filter_chain_partitions_corpus(spark, sf_dir):
    from solana_event_stream_spark.operators.training_data import (
        quality_filter_chain)
    from solana_event_stream_spark.tables import load_table
    rows = quality_filter_chain(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs  # exactly one reason each
    assert all(r.reason in {"too_short", "too_long", "low_stopword",
                            "repetitive", "pass"} for r in rows)


def test_domain_mix_caps_rates(spark, sf_dir):
    from solana_event_stream_spark.operators.training_data import (
        _BUDGET_TOKENS)
    all_rows = CATALOG["domain_mix_resample"].spark_fn(
        spark, sf_dir).collect()
    rows = [r for r in all_rows if r.part == "mix"]
    budget = [r for r in all_rows if r.part == "budget"]
    assert len(rows) >= 2 and budget
    for r in rows:   # mix: n1=n_total, n2=n_kept, v=keep_rate
        assert 0.0 < r.v <= 1.0
        assert r.n2 <= r.n1
    # the over-represented language must be downsampled hardest
    biggest = max(rows, key=lambda r: r.n1)
    assert biggest.v == min(r.v for r in rows)
    # budget part: v is the realized fill fraction of the token budget
    for r in budget:   # n1=n_docs, n2=sum_tokens, v=n2/budget
        assert r.n2 == round(r.v * _BUDGET_TOKENS)
        assert r.n1 >= 1


def test_salted_aggregate_equals_direct(spark, sf_dir):
    from pyspark.sql import functions as F
    from solana_event_stream_spark.operators.skew import salted_aggregate
    from solana_event_stream_spark.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    direct = {r.event_type: (r.n, r.mx) for r in
              ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
              .collect()}
    salted = {r.event_type: (r.n, r.mx) for r in
              salted_aggregate(ev, ["event_type"], "user_id",
                               [(F.count(F.lit(1)), F.sum, "n"),
                                (F.max("value"), F.max, "mx")])
              .collect()}
    assert salted == direct
    # the partial phase really fans a hot key across salt groups
    salt = (F.abs(F.xxhash64(F.col("user_id"))) % 16)
    n_groups = (ev.withColumn("s", salt)
                .select("event_type", "s").distinct().count())
    assert n_groups > len(direct)


def test_stratified_sample_unknown_lang_takes_default(spark, tmp_path):
    """ANSI-mode regression (round 8): element_at(map, key) throws on a
    missing key, so a corpus with a lang outside _SAMPLE_RATES used to
    kill the query; try_element_at + coalesce must take the 0.0 default
    (keep nothing) instead."""
    import os

    from solana_event_stream_spark.operators.training_data import (
        sample_stratified_hash)

    rows = [("d1", "hello world", "xx", "web", 11),
            ("d2", "bonjour", "en", "web", 7)]
    spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, "
              "n_chars int") \
        .write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "documents.parquet"))
    out = {r["lang"]: r.asDict()
           for r in sample_stratified_hash(spark, str(tmp_path)).collect()}
    assert out["xx"]["n_kept"] == 0 and out["xx"]["n_total"] == 1


def test_build_training_corpus_composition(spark):
    """The one-call pipeline drops exactly the docs each stage exists
    for: too-short, boilerplate-repetitive (survives length/uniq gates,
    dies on the 2-gram ceiling), contaminated, near-dup partner —
    clean docs survive unchanged, with a deterministic shard."""
    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)

    def sent(i, n=30):
        # unique-ish words with stopwords sprinkled in
        return " ".join("the" if d % 7 == 0 else f"w{i}x{d}"
                        for d in range(n))

    clean = [(i, "en", sent(i)) for i in range(10, 16)]
    near_dup = [(100, "en", sent(10) + " xtra")]      # ~dup of doc 10
    short = [(200, "en", "way too short")]
    # 30 words, 53% unique (passes the uniq gate) BUT "spam ham"
    # is 8 of 29 2-grams (0.276 > 0.20): the repetition gate, not the
    # uniq gate, must catch it
    rep_words = (["spam", "ham"] * 8 + ["the"]
                 + [f"z{d}" for d in range(13)])
    repetitive = [(300, "en", " ".join(rep_words))]
    contaminated = [(400, "en", "benchmark question about spark internals "
                     + sent(99, 25))]
    docs = spark.createDataFrame(
        clean + near_dup + short + repetitive + contaminated,
        "doc_id long, lang string, text string")
    bench = spark.createDataFrame(
        [("here is a benchmark question about spark internals ok",)],
        "text string")

    out = build_training_corpus(docs, eval_docs=bench, n_shards=4)
    rows = out.collect()
    got = {r.doc_id for r in rows}
    assert got == {10, 11, 12, 13, 14, 15}   # 100 deduped vs 10;
    # 200 too short; 300 repetition-gated; 400 decontaminated
    assert all(0 <= r.shard < 4 for r in rows)
    # deterministic shard: recompute == same
    again = {r.doc_id: r.shard for r in build_training_corpus(
        docs, eval_docs=bench, n_shards=4).collect()}
    assert again == {r.doc_id: r.shard for r in rows}
    # without dedup, the near-dup partner survives
    no_dd = {r.doc_id for r in build_training_corpus(
        docs, eval_docs=bench, dedup=False).collect()}
    assert no_dd == got | {100}

def test_build_training_corpus_substring_gate(spark):
    """With max_substring_dup_frac set, a doc that shares a verbatim
    >= 32-token span covering most of its windows is dropped, while
    the doc that shares the same span as a small fraction of a longer
    text survives."""
    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)

    def uniq(prefix, n):
        return " ".join("the" if d % 7 == 0 else f"{prefix}{d}"
                        for d in range(n))

    span = " ".join("the" if d % 7 == 0 else f"sp{d}" for d in range(40))
    # (all docs must sit inside the 20..90-word quality gates so the
    # substring stage — not the length gate — decides)
    # doc 1: span + 4 pad -> 44 words, 13 windows, 9 duplicated (0.69)
    # doc 2: span inside 70 words -> 39 windows, 9 duplicated (0.23)
    docs = spark.createDataFrame([
        (1, "en", span + " " + uniq("p", 4)),
        (2, "en", uniq("q", 15) + " " + span + " " + uniq("r", 15)),
        (3, "en", uniq("u", 50)),
    ], "doc_id long, lang string, text string")
    out = {r.doc_id for r in build_training_corpus(
        docs, dedup=False, max_substring_dup_frac=0.5).collect()}
    assert out == {2, 3}
    # gate off: everything passing the quality gates survives
    off = {r.doc_id for r in build_training_corpus(
        docs, dedup=False).collect()}
    assert off == {1, 2, 3}


def test_chunk_documents_goldens(spark):
    """Hand-computed chunk boundaries: 10 tokens at max=4/overlap=1
    (step 3) -> starts 0,3,6 -> chunks of 4,4,4 tokens with the
    overlap token shared (a start at 9 would add NO new token — the
    ADVICE r13 redundant-tail case); short and exact-budget docs are
    identity, with NO contained tail chunk."""
    from solana_event_stream_spark.operators.training_data import (
        chunk_documents)

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),
         (2, "a b c"),            # under budget -> one chunk
         (3, "p q r s"),          # exactly max_tokens -> one chunk
         (4, " ".join(f"u{i}" for i in range(11)))],  # true tail
        "doc_id long, text string")
    out = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
           for r in chunk_documents(docs, max_tokens=4,
                                    overlap=1).collect()}
    assert out[(1, 0)] == (4, "t0 t1 t2 t3")
    assert out[(1, 1)] == (4, "t3 t4 t5 t6")     # t3 shared (overlap 1)
    assert out[(1, 2)] == (4, "t6 t7 t8 t9")
    assert out[(2, 0)] == (3, "a b c")
    assert out[(3, 0)] == (4, "p q r s")
    assert out[(4, 3)] == (2, "u9 u10")          # genuine short tail
    assert {k[0] for k in out} == {1, 2, 3, 4}
    # exact chunk counts: contained tails never appear
    assert len([k for k in out if k[0] == 1]) == 3
    assert len([k for k in out if k[0] == 2]) == 1
    assert len([k for k in out if k[0] == 3]) == 1
    assert len([k for k in out if k[0] == 4]) == 4


def test_chunk_documents_covers_every_token(spark):
    """Reconstruction property on the real corpus: stripping each
    chunk's leading overlap and concatenating in chunk order
    reproduces the original text exactly."""
    from pyspark.sql import functions as F

    from solana_event_stream_spark.operators.training_data import (
        chunk_documents)
    from solana_event_stream_spark.tables import load_table

    docs = (load_table(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "text").limit(200))
    max_tokens, overlap = 16, 4
    ch = chunk_documents(docs, max_tokens, overlap)
    rebuilt = (ch.withColumn(
        "part",
        F.when(F.col("chunk_idx") == 0, F.col("chunk"))
        .otherwise(F.array_join(
            F.slice(F.split("chunk", " "), overlap + 1, max_tokens),
            " ")))
        .filter(F.col("part") != "")
        .groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(
            F.struct("chunk_idx", "part"))).getField("part"), " ")
            .alias("rebuilt")))
    joined = docs.join(rebuilt, "doc_id")
    bad = joined.filter(F.col("text") != F.col("rebuilt")).count()
    assert bad == 0


def test_chunk_documents_plan_narrow(spark):
    """One generate, no inferred size-filter re-evaluating the chunk
    build, no shuffle."""
    from solana_event_stream_spark.operators.training_data import (
        chunk_documents)

    docs = spark.createDataFrame([(1, "a b c d e")],
                                 "doc_id long, text string")
    ex = (chunk_documents(docs, 4, 1)
          ._jdf.queryExecution().executedPlan().toString())
    assert ex.count("Generate") == 1
    assert "Exchange" not in ex
    for ln in ex.splitlines():
        if "Filter" in ln:
            assert "size(" not in ln, ln


def test_build_training_corpus_perplexity_gate(spark):
    """With a reference LM and threshold, random-vocab garbage that
    passes every heuristic gate is dropped while in-domain text
    survives; threshold off keeps both."""
    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)
    from solana_event_stream_spark.tables import load_table

    ref = (load_table(spark, "/root/testdata/sf0.001", "documents")
           .select("doc_id", "text").limit(300))
    sample = ref.limit(1).collect()[0].text
    n = len(sample.split(" "))
    # garbage with enough stopwords/uniqueness to pass the heuristics
    garbage = " ".join("the" if i % 7 == 0 else f"zzq{i}"
                       for i in range(n))
    docs = spark.createDataFrame(
        [(1, "en", sample), (2, "en", garbage)],
        "doc_id long, lang string, text string")
    both = {r.doc_id for r in build_training_corpus(
        docs, dedup=False).collect()}
    assert both == {1, 2}
    # threshold between the two measured scores (the synthetic
    # template corpus separates thinly; the ordering is what the gate
    # rides — see test_perplexity_filter_orders_in_domain_first)
    from solana_event_stream_spark.operators.text_analysis import (
        score_perplexity, train_bigram_lm)
    ppl = {r.doc_id: r.perplexity for r in score_perplexity(
        docs.select("doc_id", "text"), train_bigram_lm(ref)).collect()}
    assert ppl[1] < ppl[2]
    kept = {r.doc_id for r in build_training_corpus(
        docs, dedup=False, reference_docs=ref,
        max_perplexity=(ppl[1] + ppl[2]) / 2).collect()}
    assert kept == {1}


def test_build_training_corpus_chunk_pack_composition(spark):
    """VERDICT r13 item 7: the one-call pipeline emits fixed-budget
    training rows. Every surviving token appears in at least one
    chunk; per doc the overlap tax matches the documented formula
    (sum of chunk tokens == n + overlap * (n_chunks - 1)); pack
    labels fill greedily per bucket with straddle semantics; packing
    without chunking is refused."""
    import pytest
    from pyspark.sql import functions as F

    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)

    def doc(i, n):
        # enough stopwords to pass gates, unique words to dodge dedup
        return (i, "en", " ".join(
            "the" if j % 5 == 0 else f"d{i}w{j}" for j in range(n)))

    docs = spark.createDataFrame(
        [doc(1, 30), doc(2, 45), doc(3, 80)],
        "doc_id long, lang string, text string")
    max_tokens, overlap, budget = 16, 4, 32
    out = build_training_corpus(
        docs, dedup=False, min_words=1, max_words=10_000,
        min_stop_ratio=0.0, min_unique_ratio=0.0,
        chunk_max_tokens=max_tokens, chunk_overlap=overlap,
        pack_budget=budget, n_shards=4).collect()
    assert out
    assert {"doc_id", "lang", "chunk_idx", "n_tokens", "chunk",
            "bucket", "pack_seq", "shard"} <= {c for r in out[:1]
                                               for c in r.asDict()}

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in ((1, 30), (2, 45), (3, 80)):
        rows = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        # coverage: stripping each chunk's leading overlap rebuilds
        rebuilt = rows[0].chunk.split(" ")
        for r in rows[1:]:
            rebuilt += r.chunk.split(" ")[overlap:]
        assert len(rebuilt) == n
        assert len(set(rebuilt)) == len(set(
            w for r in rows for w in r.chunk.split(" ")))
        # overlap tax formula
        assert sum(r.n_tokens for r in rows) == n + overlap * (
            len(rows) - 1)
        # chunks of one doc share one shard and one bucket
        assert len({r.shard for r in rows}) == 1
        assert len({r.bucket for r in rows}) == 1

    # greedy pack fill: the pack a chunk lands in is where its first
    # token falls in the bucket's running total
    for bucket in {r.bucket for r in out}:
        rows = sorted((r for r in out if r.bucket == bucket),
                      key=lambda r: (r.doc_id, r.chunk_idx))
        cum = 0
        for r in rows:
            assert r.pack_seq == cum // budget
            cum += r.n_tokens

    with pytest.raises(ValueError, match="pack_budget requires"):
        build_training_corpus(docs, dedup=False, pack_budget=budget)


def test_dedup_survivors_by_quality_keeper(spark):
    """dedup_survivors_by keeps the max-score row per cluster (ties ->
    min id), unclustered rows pass through untouched, and the default
    min-id form is recovered by a constant score."""
    from solana_event_stream_spark.operators.dedup import (
        dedup_survivors, dedup_survivors_by)

    docs = spark.createDataFrame(
        [(1, "short", 5), (2, "much longer text here", 21),
         (3, "mid size", 8),          # cluster A: 1,2,3 -> keep 2
         (10, "tie a", 7), (11, "tie b", 7),   # cluster B: tie -> 10
         (50, "solo doc", 9)],        # unclustered -> kept
        "doc_id long, text string, n_chars int")
    memb = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long")

    kept = {r.doc_id for r in dedup_survivors_by(
        docs, memb, F.col("n_chars")).collect()}
    assert kept == {2, 10, 50}
    # constant score degenerates to the min-id canonical rule
    base = {r.doc_id for r in dedup_survivors(docs, memb).collect()}
    const = {r.doc_id for r in dedup_survivors_by(
        docs, memb, F.lit(0)).collect()}
    assert const == base == {1, 10, 50}
    # rows come back unchanged (full original columns)
    row = dedup_survivors_by(docs, memb, F.col("n_chars")) \
        .filter(F.col("doc_id") == 2).collect()[0]
    assert row.text == "much longer text here" and row.n_chars == 21


def test_build_training_corpus_keeper_score(spark):
    """keeper_score flips the near-dup keeper from min-id to max-score
    inside the one-call pipeline."""
    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)

    def sent(i, n=30, extra=""):
        return " ".join("the" if d % 7 == 0 else f"w{i}x{d}"
                        for d in range(n)) + extra

    docs = spark.createDataFrame(
        [(1, "en", sent(10)),                    # near-dup pair: 1, 2
         (2, "en", sent(10, extra=" longer tail words here")),
         (3, "en", sent(99))],                   # unrelated
        "doc_id long, lang string, text string")
    default = {r.doc_id for r in build_training_corpus(docs).collect()}
    assert default == {1, 3}                     # min-id keeper
    longest = {r.doc_id for r in build_training_corpus(
        docs, keeper_score=F.length("text")).collect()}
    assert longest == {2, 3}                     # max-length keeper


def test_chunk_documents_property_over_parameter_space(spark):
    """Property pin for the r13/r14 chunk math across the (n,
    max_tokens, overlap) space: exact coverage (stripping each chunk's
    leading overlap rebuilds the doc), NO chunk wholly contained in
    its predecessor (the ADVICE r13 redundant-tail class), and the
    overlap-tax identity sum(n_tokens) == n + overlap*(n_chunks-1).
    One Spark job for the whole grid (docs carry their params)."""
    from solana_event_stream_spark.operators.training_data import (
        chunk_documents)

    cases = []
    did = 0
    for max_tokens, overlap in ((4, 1), (4, 3), (8, 0), (8, 4),
                                (16, 4), (16, 15), (5, 2), (7, 3)):
        for n in (1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 50):
            did += 1
            cases.append((did, max_tokens, overlap,
                          " ".join(f"t{i}" for i in range(n)), n))

    by_params = {}
    for did, mt, ov, text, n in cases:
        by_params.setdefault((mt, ov), []).append((did, text, n))
    for (mt, ov), rows in by_params.items():
        docs = spark.createDataFrame(
            [(d, t) for d, t, _ in rows], "doc_id long, text string")
        out = {}
        for r in chunk_documents(docs, max_tokens=mt,
                                 overlap=ov).collect():
            out.setdefault(r.doc_id, []).append(r)
        n_of = {d: n for d, _, n in rows}
        for did, chunks in out.items():
            chunks = sorted(chunks, key=lambda r: r.chunk_idx)
            n = n_of[did]
            toks = [c.chunk.split(" ") for c in chunks]
            # coverage: leading-overlap-stripped concat == original
            rebuilt = list(toks[0])
            for t in toks[1:]:
                rebuilt += t[ov:]
            assert rebuilt == [f"t{i}" for i in range(n)], (
                mt, ov, n, rebuilt)
            # no contained tail: every chunk after the first adds
            # at least one new token
            for t in toks[1:]:
                assert len(t) > ov, (mt, ov, n, t)
            # overlap-tax identity
            assert sum(c.n_tokens for c in chunks) == n + ov * (
                len(chunks) - 1), (mt, ov, n)


def test_sample_token_budget_fill_and_determinism(spark, sf_dir):
    """Per-group token budgets are floors hit exactly at the straddle
    doc (selected tokens in [budget, budget + max kept doc)); groups
    under budget keep everything; the draw is deterministic; rows come
    back unchanged. Differential vs the naive single-phase fill (no
    safety cut) pins that the two-phase estimate drops nothing."""
    from solana_event_stream_spark.operators.training_data import (
        _hash_unit, sample_token_budget)
    from solana_event_stream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    budget = 2000
    out = sample_token_budget(docs, budget).collect()
    again = {r.doc_id for r in sample_token_budget(docs, budget)
             .collect()}
    assert {r.doc_id for r in out} == again       # deterministic

    totals = {r.lang: r.tok for r in docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("tok")).collect()}
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        got = sum(r.n_tokens for r in rows)
        if totals[lang] <= budget:
            assert got == totals[lang]            # under budget: all
        else:
            assert budget <= got < budget + max(
                r.n_tokens for r in rows)         # straddle semantics

    # two-phase == naive one-phase (hash-order fill over ALL rows)
    from pyspark.sql import Window

    staged = (docs
              .withColumn("_nt", F.size(F.split("text", " "))
                          .cast("long"))
              .withColumn("_h", _hash_unit(F.col("doc_id"))))
    w = (Window.partitionBy("lang").orderBy("_h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive = {r.doc_id for r in staged
             .withColumn("_cum", F.sum("_nt").over(w))
             .filter(F.col("_cum") - F.col("_nt") < budget).collect()}
    assert {r.doc_id for r in out} == naive

    import pytest
    with pytest.raises(ValueError, match="budget_tokens"):
        sample_token_budget(docs, 0)


def test_sample_token_budget_skew_fallback_guarantees_floor(spark):
    """ADVICE r14: with one giant doc whose hash draw lands ABOVE the
    safety-cut rate, the hash-cut pool under-fills; the in-plan
    fallback must detect the shortfall and fill from the FULL group —
    the budget floor is guaranteed, not probabilistic."""
    import hashlib

    from solana_event_stream_spark.operators.training_data import (
        sample_token_budget)

    def draw(i):
        return (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                % 1_000_000) / 1e6

    giant_id = next(i for i in range(1, 10000) if draw(i) > 0.95)
    tiny_ids = [i for i in range(10000, 20000) if draw(i) < 0.5][:20]
    budget = 1000
    # giant: 5000 tokens; tinies: 5 tokens each -> group total 5100,
    # rate = 1.5*1000/5100 ~= 0.29 < giant's 0.95 draw: the pool holds
    # only tiny docs (< 100 tokens << budget) without the fallback
    rows = [(giant_id, "g", " ".join(f"t{j}" for j in range(5000)))]
    rows += [(i, "g", "a b c d e") for i in tiny_ids]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string")
    out = sample_token_budget(docs, budget).collect()
    got = sum(r.n_tokens for r in out)
    assert got >= budget, got          # the floor held
    assert any(r.doc_id == giant_id for r in out)   # via the fallback


def test_pack_budget_must_hold_a_chunk(spark):
    import pytest

    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus)

    docs = spark.createDataFrame(
        [(1, "en", " ".join(f"w{j}" for j in range(40)))],
        "doc_id long, lang string, text string")
    with pytest.raises(ValueError, match="must be >= chunk_max_tokens"):
        build_training_corpus(docs, dedup=False, chunk_max_tokens=32,
                              chunk_overlap=8, pack_budget=16)


def test_build_training_corpus_token_budget_stage(spark):
    """budget_tokens slots between dedup and chunking: per-group
    hash-order fill to the floor, then chunking runs over the
    budgeted survivors only."""
    from solana_event_stream_spark.operators.training_data import (
        build_training_corpus, sample_token_budget)

    # quality gates need 20..90 words with stopwords + uniqueness:
    # build 30-word docs with a few stopwords sprinkled in
    def text(tag, n=30):
        toks = [f"{tag}{j}" for j in range(n - 4)]
        return " ".join(toks + ["the", "of", "to", "and"])

    rows = [(1, "en", text("a")), (2, "en", text("b")),
            (3, "en", text("c")), (4, "de", text("d"))]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string")
    out = build_training_corpus(docs, dedup=False, budget_tokens=40)
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    # en: 3x30 tokens, budget 40 -> exactly 2 kept (floor + straddle);
    # de: under budget -> everything
    assert len(by_lang["en"]) == 2 and by_lang["de"] == [4]
    # identical to composing the operator by hand
    want = {r.doc_id for r in sample_token_budget(
        docs, 40).collect()}
    assert {r.doc_id for r in out.collect()} == want
    # budget + chunking compose: chunk rows only for budget survivors
    chunked = build_training_corpus(docs, dedup=False, budget_tokens=40,
                                    chunk_max_tokens=16, chunk_overlap=4)
    assert {r.doc_id for r in chunked.collect()} == want
    assert "chunk" in chunked.columns
    import pytest
    with pytest.raises(ValueError, match="budget_by"):
        build_training_corpus(docs, dedup=False, budget_tokens=40,
                              budget_by="nope")


def test_ngram_jaccard_tolerates_degenerate_docs(spark, tmp_path):
    """Regression (r15 degenerate-input sweep): 1-word docs crashed
    the bigram builder (sequence(0,-1) descends into element_at out
    of bounds under ANSI) and empty-gram docs formed an all-match
    band clique with 0/0 Jaccard. Short docs must simply emit no
    grams and never pair."""
    import os

    rows = [(0, "", "en", "web", 0),
            (1, "single", "en", "web", 6),
            (2, "two words", "en", "web", 9),
            (50, "a long enough document with plenty of words to form "
                 "many bigrams for the verify", "en", "web", 80)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars int") \
        .write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "documents.parquet"))
    out = CATALOG["dedup_ngram_jaccard"].spark_fn(
        spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # doc 50 is a %25==0 exact-copy candidate in docs_with_dups:
    # its injected exact copy must pair; no degenerate doc appears
    assert (50, 2000050) in pairs
    assert all(a not in (0, 1, 2) and b not in (0, 1, 2)
               for a, b in pairs)


def test_text_battery_tolerates_empty_text(spark, tmp_path):
    """Empty text has 0 chars and 0 BPE-ish tokens: nonalpha_ratio and
    bytes_per_token must be NULL (try_divide — DuckDB's exact
    division-by-zero value), not an ANSI crash (r15 degenerate-input
    sweep)."""
    import os

    rows = [(0, "", "en", "web", 0),
            (1, "a perfectly ordinary document with words", "en",
             "web", 41)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars int") \
        .write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), "documents.parquet"))
    out = CATALOG["text_battery"].spark_fn(spark, str(tmp_path)).collect()
    assert out
    vals = {(r.part, r.k1, r.metric): r.vd for r in out
            if r.k1 == "0" and r.metric in ("nonalpha_ratio",
                                            "bytes_per_token")}
    assert vals and all(v is None for v in vals.values())


def test_domain_mix_fused_equals_standalone_composition(spark, sf_dir):
    """The fused three-scan catalog form must be value-identical to
    composing the standalone operators (mix rates + sample_token_budget
    fill) — the training_sample_filter precedent."""
    from solana_event_stream_spark.operators.training_data import (
        _BUDGET_SAFETY, _BUDGET_TOKENS, sample_token_budget)
    from solana_event_stream_spark.tables import load_table

    got = {(r.part, r.lang): (r.n1, r.n2, round(r.v, 12))
           for r in CATALOG["domain_mix_resample"].spark_fn(
               spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    fill = (sample_token_budget(docs, _BUDGET_TOKENS, by="lang",
                                safety=_BUDGET_SAFETY)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n1"),
                 F.sum("n_tokens").alias("n2")).collect())
    for r in fill:
        assert got[("budget", r.lang)] == (
            r.n1, r.n2, round(r.n2 / _BUDGET_TOKENS, 12))
