"""Training-data pipeline operators over the `documents` table:
deterministic stratified sampling, token-budget sequence packing,
composable quality-filter chains, and domain-mixing resampling.

These are the corpus-preparation steps a large-scale LLM training
pipeline runs between raw ingest and tokenization. Beyond-reference
operators (no analog in /root/reference) — they extend the engine the
same way the dedup/similarity family does.

Scale design (100 TB):
- sampling / filtering / mixing are NARROW per-row transforms (one
  deterministic md5-hash draw per row, no shuffle); only the summary
  aggregations shuffle, and those are map-side combined on low-cardinality
  keys (lang, source, reason);
- packing is BUCKETED: documents pack within hash buckets (bucket ==
  partition at scale), so the running-total window sorts per bucket —
  never a global sort;
- domain mixing broadcasts a per-domain rate table (5-1000 rows) — the
  corpus-side plan stays narrow.

Determinism: sampling draws come from md5(doc_id), folded to a unit
float identically on both engines (Spark `conv`; DuckDB digit fold —
the same cross-engine recipe as operators/dedup.py minhash). No RNG, no
seed plumbing: re-running a sample on the same corpus is reproducible by
construction, and adding/removing rows never changes other rows' draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..catalog import register
from ..tables import load_table

# ---------------------------------------------------------------------------
# Deterministic unit-interval hash draw (cross-engine identical)
# ---------------------------------------------------------------------------

_HASH_MOD = 1_000_000


def _hash_unit(col) -> F.Column:
    """md5(value) -> 60-bit int -> uniform double in [0, 1)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
            .cast("long") % _HASH_MOD) / F.lit(float(_HASH_MOD))


_SQL_HASH_INT = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 16), "
    "i -> CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST({c} AS VARCHAR)), i, 1)) - 1 AS BIGINT))), "
    "(acc, d) -> acc * 16 + d)")

_SQL_HASH_UNIT = (
    f"(({_SQL_HASH_INT} % {_HASH_MOD}) / {float(_HASH_MOD)})")


# ---------------------------------------------------------------------------
# Stratified sampling (per-language rates)
# ---------------------------------------------------------------------------

_SAMPLE_RATES = {"en": 0.25, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.75}

_SQL_RATE = ("CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items())
    + " ELSE 0.0 END")


# sample_stratified_hash / quality_filter_chain register as ONE catalog
# entry (training_sample_filter, defined after both) for the driver
# 50-row-cap reason.

_SQL_SAMPLE_STRATIFIED = f"""
    WITH drawn AS (
      SELECT lang,
             CASE WHEN {_SQL_HASH_UNIT.format(c='doc_id')} < ({_SQL_RATE})
                  THEN 1 ELSE 0 END AS kept
      FROM documents)
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS realized_rate
    FROM drawn GROUP BY lang
"""


def sample_stratified_hash(spark, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates via
    an md5(doc_id) unit draw — reproducible, shuffle-free (only the
    5-key summary aggregates), and stable under corpus growth (a row's
    draw never depends on other rows)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # try_element_at: under ANSI mode element_at(map, key) THROWS on a
    # missing key, so a corpus with a lang outside _SAMPLE_RATES would
    # kill the query instead of taking the coalesce's 0.0 default
    rate = F.coalesce(
        F.try_element_at(
            F.create_map(*[F.lit(x) for kv in _SAMPLE_RATES.items()
                           for x in kv]),
            F.col("lang")),
        F.lit(0.0))
    kept = F.when(_hash_unit(F.col("doc_id")) < rate, 1).otherwise(0)
    return (docs.select("lang", kept.alias("kept"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum("kept").alias("n_kept"),
                 (F.sum("kept").cast("double") / F.count(F.lit(1)))
                 .alias("realized_rate")))


# ---------------------------------------------------------------------------
# Token-budget sequence packing
# ---------------------------------------------------------------------------

_PACK_BUCKETS = 32
_PACK_BUDGET = 512  # tokens per pack (word-count proxy)


_CHUNK_MAX, _CHUNK_OVERLAP = 32, 8
_CHUNK_STEP = _CHUNK_MAX - _CHUNK_OVERLAP
_CHUNK_PACK_BUDGET = 64

_SQL_CHUNKPACK_PART = f"""
    WITH cdoc AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
    cst AS (
      SELECT doc_id, n,
             CASE WHEN n - {_CHUNK_OVERLAP + 1} > 0
                  THEN (n - {_CHUNK_OVERLAP + 1})
                       - ((n - {_CHUNK_OVERLAP + 1}) % {_CHUNK_STEP})
                  ELSE 0 END AS last
      FROM cdoc),
    cch AS (SELECT doc_id, n,
                   unnest(range(0, last + 1, {_CHUNK_STEP})) AS s
            FROM cst),
    ctk AS (
      SELECT doc_id, s // {_CHUNK_STEP} AS chunk_idx,
             least({_CHUNK_MAX}, n - s) AS nt,
             doc_id % {_PACK_BUCKETS} AS bucket
      FROM cch),
    ccum AS (
      SELECT bucket, nt,
             SUM(nt) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM ctk),
    cpk AS (
      SELECT bucket, nt,
             CAST(floor((c - nt) / {float(_CHUNK_PACK_BUDGET)})
                  AS BIGINT) AS pack_seq
      FROM ccum)
    SELECT 'chunkpack' AS part, bucket AS k1,
           COUNT(DISTINCT pack_seq) AS k2, COUNT(*) AS n,
           CAST(SUM(nt) AS BIGINT) AS tok
    FROM cpk GROUP BY bucket
"""


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
             len(string_split(text, ' ')) AS n_tok
      FROM documents),
    cum AS (
      SELECT bucket, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tok
      FROM toks),
    packs AS (
      SELECT bucket,
             CAST(floor((cum_tok - n_tok) / {float(_PACK_BUDGET)})
                  AS BIGINT) AS pack_seq,
             n_tok
      FROM cum)
    SELECT 'pack' AS part, bucket AS k1, pack_seq AS k2,
           COUNT(*) AS n, CAST(SUM(n_tok) AS BIGINT) AS tok
    FROM packs GROUP BY bucket, pack_seq
    UNION ALL
    SELECT * FROM ({_SQL_CHUNKPACK_PART})
    """,
    tags=("training-data", "llm-data", "packing", "chunking"),
    doc="Sequence packing as one tagged union (driver 50-row-cap "
        "consolidation; r15 catalog promotion of chunk->pack). "
        "part='pack': whole docs fill 512-token packs in doc_id order "
        "WITHIN hash buckets (bucket == partition at scale), so the "
        "running-total window never needs a global sort. "
        "part='chunkpack': the composed training-row path — "
        "chunk_documents (32-token windows, 8 overlap) then the greedy "
        "64-token pack labeling over the chunks, per-bucket chunk/"
        "pack/token counts hash-pinned (the overlap tax and "
        "contained-tail behavior are inside the numbers).",
)
def pack_sequences(spark, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_BUCKETS).alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = toks.select(
        "bucket", "n_tok", F.sum("n_tok").over(w).alias("cum_tok"))
    packs = cum.select(
        "bucket",
        F.floor((F.col("cum_tok") - F.col("n_tok"))
                / F.lit(float(_PACK_BUDGET))).alias("pack_seq"),
        "n_tok")
    pack = (packs.groupBy("bucket", "pack_seq")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_tok").alias("tok"))
            .select(F.lit("pack").alias("part"),
                    F.col("bucket").alias("k1"),
                    F.col("pack_seq").alias("k2"), "n", "tok"))
    # the composed chunk->pack path, via the REAL operator
    chunks = chunk_documents(docs, max_tokens=_CHUNK_MAX,
                             overlap=_CHUNK_OVERLAP)
    cw = (Window.partitionBy("bucket").orderBy("doc_id", "chunk_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    labeled = (chunks
               .withColumn("bucket", F.col("doc_id") % _PACK_BUCKETS)
               .withColumn("_cum",
                           F.sum("n_tokens").over(cw).cast("long"))
               .withColumn("pack_seq",
                           F.floor((F.col("_cum") - F.col("n_tokens"))
                                   / F.lit(float(_CHUNK_PACK_BUDGET)))))
    chunkpack = (labeled.groupBy("bucket")
                 .agg(F.countDistinct("pack_seq").alias("k2"),
                      F.count(F.lit(1)).alias("n"),
                      F.sum("n_tokens").cast("long").alias("tok"))
                 .select(F.lit("chunkpack").alias("part"),
                         F.col("bucket").alias("k1"), "k2", "n", "tok"))
    return pack.unionByName(chunkpack)


# ---------------------------------------------------------------------------
# Quality-filter chain (first-failing-reason accounting)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
_MIN_WORDS, _MAX_WORDS = 20, 90
_MIN_STOP_RATIO = 0.01
_MIN_UNIQUE_RATIO = 0.40

_SQL_STOPLIST = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


_SQL_QUALITY_CHAIN = f"""
    WITH m AS (
      SELECT len(w) AS n_words,
             len(list_filter(w, x -> x IN {_SQL_STOPLIST})) * 1.0
               / len(w) AS stop_ratio,
             len(list_distinct(w)) * 1.0 / len(w) AS uniq_ratio
      FROM (SELECT string_split(text, ' ') AS w FROM documents)),
    verdicts AS (
      SELECT n_words,
             CASE WHEN n_words < {_MIN_WORDS} THEN 'too_short'
                  WHEN n_words > {_MAX_WORDS} THEN 'too_long'
                  WHEN stop_ratio < {_MIN_STOP_RATIO} THEN 'low_stopword'
                  WHEN uniq_ratio < {_MIN_UNIQUE_RATIO} THEN 'repetitive'
                  ELSE 'pass' END AS reason
      FROM m)
    SELECT reason, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS DOUBLE) / COUNT(*) AS avg_words
    FROM verdicts GROUP BY reason
"""


def quality_filter_chain(spark, sf_dir: str) -> DataFrame:
    """Composable quality-filter chain with first-failing-reason
    accounting: length bounds -> stopword-ratio floor -> unique-word-
    ratio floor. Narrow per-row CASE ladder (one pass, no UDF); the
    per-reason rollup is the only shuffle. (A conditional load_spread
    rebalance was A/B-measured here at 1.12x — the stopword filter is
    too light to amortize the extra exchange; see BENCH_NOTES r13.)"""
    docs = load_table(spark, sf_dir, "documents").select("text")
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    m = docs.select(
        F.size(w).alias("n_words"),
        (F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
         * F.lit(1.0) / F.size(w)).alias("stop_ratio"),
        (F.size(F.array_distinct(w)) * F.lit(1.0) / F.size(w))
        .alias("uniq_ratio"))
    reason = (F.when(F.col("n_words") < _MIN_WORDS, "too_short")
              .when(F.col("n_words") > _MAX_WORDS, "too_long")
              .when(F.col("stop_ratio") < _MIN_STOP_RATIO, "low_stopword")
              .when(F.col("uniq_ratio") < _MIN_UNIQUE_RATIO, "repetitive")
              .otherwise("pass"))
    return (m.select("n_words", reason.alias("reason"))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum("n_words").cast("double") / F.count(F.lit(1)))
                 .alias("avg_words")))


# ---------------------------------------------------------------------------
# Deterministic shard assignment (training-shard writer stats)
# ---------------------------------------------------------------------------

_N_SHARDS = 16

_SQL_SHARD_STATS = f"""
    WITH sharded AS (
      SELECT ({_SQL_HASH_INT.format(c='doc_id')}) % {_N_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents)
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS share
    FROM sharded GROUP BY shard
"""


def shard_assignment_stats(spark, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5(doc_id) %
    N — the 'global shuffle' a training run needs, without a sort: the
    hash IS the permutation, every row's shard is independent of every
    other row (adding data never moves existing rows between shards),
    and a shard writer is a plain partitionBy("shard") with no skew
    (md5 is uniform). The query reports per-shard doc/token balance —
    the property that matters at 100 TB (a skewed shard serializes one
    training data-loader)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shard = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 15), 16, 10)
             .cast("long") % _N_SHARDS)
    sharded = docs.select(
        shard.alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    per_shard = (sharded.groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_tok").alias("sum_tok")))
    total = per_shard.agg(
        F.sum("n_docs").cast("double").alias("grand_total"))
    return (per_shard.crossJoin(F.broadcast(total))
            .select("shard", "n_docs", "sum_tok",
                    (F.col("n_docs").cast("double")
                     / F.col("grand_total")).alias("share")))


@register(
    "training_sample_filter",
    oracle=f"""
    SELECT 'sample' AS part, lang AS k1, n_total AS n1, n_kept AS n2,
           realized_rate AS v
    FROM ({_SQL_SAMPLE_STRATIFIED}) s
    UNION ALL
    SELECT 'filter' AS part, reason AS k1, n_docs AS n1,
           CAST(NULL AS BIGINT) AS n2, avg_words AS v
    FROM ({_SQL_QUALITY_CHAIN}) q
    UNION ALL
    SELECT 'shard' AS part, CAST(shard AS VARCHAR) AS k1, n_docs AS n1,
           sum_tok AS n2, share AS v
    FROM ({_SQL_SHARD_STATS}) sh
    """,
    tags=("training-data", "llm-data", "sampling", "quality", "sharding"),
    doc="Deterministic stratified sampling, the quality-filter chain, "
        "and per-shard balance of the deterministic shard assignment "
        "(hash-as-global-shuffle) as one tagged union (driver "
        "50-row-cap consolidation). Each branch keeps its full narrow "
        "per-row plan; only the tiny summary rollups shuffle.",
)
def training_sample_filter(spark, sf_dir: str) -> DataFrame:
    """Fused one-pass form (r13): the three parts each aggregated the
    same corpus through their own scan (the scan audit read FOUR
    documents scans). Now one staged projection computes every
    per-row input — the md5 hash int is derived ONCE and feeds both
    the sampling draw and the shard assignment — one explode emits a
    (kind, key) struct per part per row, ONE groupBy covers all three
    parts' aggregates, and the ~25-row result is persisted
    (catalog-tracked) for the part selections. Values bit-identical
    to the standalone operators; oracle SQL unchanged."""
    from ..catalog import track_persist

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    s1 = docs.select("doc_id", "lang", F.split("text", " ").alias("_w"))
    nw = F.size("_w")
    hash_int = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                   1, 15), 16, 10).cast("long"))
    rate = F.coalesce(
        F.try_element_at(
            F.create_map(*[F.lit(x) for kv in _SAMPLE_RATES.items()
                           for x in kv]),
            F.col("lang")),
        F.lit(0.0))
    s2 = s1.select(
        "lang", nw.alias("_nw"),
        (F.size(F.filter(F.col("_w"), lambda x:
                         F.array_contains(stop_arr, x)))
         * F.lit(1.0) / nw).alias("_stop"),
        (F.size(F.array_distinct("_w")) * F.lit(1.0) / nw).alias("_uniq"),
        F.when((hash_int % _HASH_MOD) / F.lit(float(_HASH_MOD)) < rate, 1)
        .otherwise(0).cast("long").alias("_kept"),
        (hash_int % _N_SHARDS).cast("string").alias("_shard"))
    reason = (F.when(F.col("_nw") < _MIN_WORDS, "too_short")
              .when(F.col("_nw") > _MAX_WORDS, "too_long")
              .when(F.col("_stop") < _MIN_STOP_RATIO, "low_stopword")
              .when(F.col("_uniq") < _MIN_UNIQUE_RATIO, "repetitive")
              .otherwise("pass"))
    null_l = F.lit(None).cast("long")
    kinds = s2.select(F.explode(F.array(
        F.struct(F.lit("sample").alias("kind"), F.col("lang").alias("key"),
                 F.col("_kept").alias("kept"), null_l.alias("nw")),
        F.struct(F.lit("filter").alias("kind"), reason.alias("key"),
                 null_l.alias("kept"), F.col("_nw").cast("long")
                 .alias("nw")),
        F.struct(F.lit("shard").alias("kind"), F.col("_shard").alias("key"),
                 null_l.alias("kept"), F.col("_nw").cast("long")
                 .alias("nw")),
    )).alias("g")).select("g.*")
    agg = track_persist(
        kinds.groupBy("kind", "key").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("kept").alias("n_kept"),
            F.sum("nw").alias("sum_w")))
    samp = agg.filter(F.col("kind") == "sample").select(
        F.lit("sample").alias("part"), F.col("key").alias("k1"),
        F.col("n").alias("n1"), F.col("n_kept").alias("n2"),
        (F.col("n_kept").cast("double") / F.col("n")).alias("v"))
    filt = agg.filter(F.col("kind") == "filter").select(
        F.lit("filter").alias("part"), F.col("key").alias("k1"),
        F.col("n").alias("n1"), F.lit(None).cast("long").alias("n2"),
        (F.col("sum_w").cast("double") / F.col("n")).alias("v"))
    shard_rows = agg.filter(F.col("kind") == "shard")
    total = shard_rows.agg(F.sum("n").cast("double").alias("grand_total"))
    shard = (shard_rows.crossJoin(F.broadcast(total)).select(
        F.lit("shard").alias("part"), F.col("key").alias("k1"),
        F.col("n").alias("n1"), F.col("sum_w").alias("n2"),
        (F.col("n").cast("double") / F.col("grand_total")).alias("v")))
    return samp.unionByName(filt).unionByName(shard)


# ---------------------------------------------------------------------------
# Domain mixing (resample to a uniform per-language target)
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 1000
_BUDGET_SAFETY = 1.5

_SQL_BUDGET_PART = f"""
    WITH bt AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS nt,
             {_SQL_HASH_UNIT.format(c='doc_id')} AS h
      FROM documents),
    btot AS (SELECT lang, CAST(SUM(nt) AS BIGINT) AS grp
             FROM bt GROUP BY lang),
    bcut AS (
      SELECT bt.*
      FROM bt JOIN btot USING (lang)
      WHERE grp <= {_BUDGET_TOKENS}
         OR h < least(1.0, CAST({_BUDGET_SAFETY} AS DOUBLE)
                           * {_BUDGET_TOKENS} / grp)),
    bpool AS (SELECT lang, SUM(nt) AS pool FROM bcut GROUP BY lang),
    bcand AS (
      SELECT bt.lang, bt.doc_id, bt.nt, bt.h
      FROM bt JOIN btot USING (lang) LEFT JOIN bpool USING (lang)
      WHERE grp <= {_BUDGET_TOKENS}
         OR h < least(1.0, CAST({_BUDGET_SAFETY} AS DOUBLE)
                           * {_BUDGET_TOKENS} / grp)
         OR pool IS NULL OR pool < {_BUDGET_TOKENS}),
    bcum AS (
      SELECT lang, nt,
             SUM(nt) OVER (PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM bcand)
    SELECT 'budget' AS part, lang, COUNT(*) AS n1,
           CAST(SUM(nt) AS BIGINT) AS n2,
           CAST(SUM(nt) AS DOUBLE) / {_BUDGET_TOKENS} AS v
    FROM bcum WHERE c - nt < {_BUDGET_TOKENS} GROUP BY lang
"""


@register(
    "domain_mix_resample",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
    tgt AS (
      SELECT lang, n_total,
             least(1.0, (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                         / (SELECT COUNT(DISTINCT lang) FROM documents))
                        / n_total) AS keep_rate
      FROM counts),
    drawn AS (
      SELECT d.lang,
             CASE WHEN {_SQL_HASH_UNIT.format(c='d.doc_id')} < t.keep_rate
                  THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN tgt t ON d.lang = t.lang)
    SELECT 'mix' AS part, t.lang, t.n_total AS n1,
           CAST(SUM(drawn.kept) AS BIGINT) AS n2, t.keep_rate AS v
    FROM drawn JOIN tgt t ON drawn.lang = t.lang
    GROUP BY t.lang, t.n_total, t.keep_rate
    UNION ALL
    SELECT * FROM ({_SQL_BUDGET_PART})
    """,
    tags=("training-data", "llm-data", "mixing", "sampling"),
    doc="Domain mixing + token-budget sampling as one tagged union "
        "(driver 50-row-cap consolidation; r15 catalog promotion of "
        "sample_token_budget). part='mix': downsample over-represented "
        "languages to a uniform target share (broadcast rate table, "
        "narrow corpus scan). part='budget': keep documents in "
        "deterministic md5-hash order until each language reaches "
        "1,000 tokens — the two-phase hash-cut fill with the "
        "guaranteed-floor fallback, hash-pinned per language.",
)
def domain_mix_resample(spark, sf_dir: str) -> DataFrame:
    """Fused THREE-scan form (r16): the naive composition — the mix
    part's counts + drawn passes plus sample_token_budget's
    totals/pool/fill passes — read documents SEVEN times (scan
    audit); r15 fused it to four, and the r16 drift adjudication
    found the last fusable pair (the pool and mix aggregates are both
    per-lang sums over the same joined rows whose predicates cannot
    push to parquet — conditional sums merge them). Scan 1 is ONE
    per-lang aggregate feeding both parts (mix counts ride the budget
    totals); scan 2 carries the pool totals under the cut AND the mix
    keep-draws; scan 3 the budget fill, whose window runs over pool
    rows only. Values bit-identical to composing the standalone
    operators (pinned in tests/test_training_data.py); oracle SQL
    unchanged."""
    from ..catalog import track_persist

    n_tok = F.size(F.split("text", " ")).cast("long")
    staged = (load_table(spark, sf_dir, "documents")
              .select("doc_id", "lang", n_tok.alias("_nt"),
                      _hash_unit(F.col("doc_id")).alias("_h")))
    # scan 1: one per-lang aggregate for BOTH parts (cached: ~n_langs
    # rows; every later reference is driver-side-small)
    aggs = track_persist(
        staged.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("_nt").alias("_grp_tok")))
    scalars = aggs.agg(F.sum("n_total").alias("grand_total"),
                       F.count(F.lit(1)).alias("n_langs"))
    rates = (aggs.crossJoin(F.broadcast(scalars))
             .select("lang", "n_total", "_grp_tok",
                     F.least(
                         F.lit(1.0),
                         (F.col("grand_total").cast("double")
                          / F.col("n_langs")) / F.col("n_total"))
                     .alias("keep_rate"),
                     F.least(F.lit(1.0),
                             F.lit(float(_BUDGET_SAFETY))
                             * F.lit(float(_BUDGET_TOKENS))
                             / F.col("_grp_tok")).alias("_brate")))
    joined = staged.join(F.broadcast(rates), "lang")
    cut = ((F.col("_grp_tok") <= _BUDGET_TOKENS)
           | (F.col("_h") < F.col("_brate")))
    # scan 2: ONE pass carries BOTH small per-lang aggregates — the
    # pool totals under the hash cut (the floor guarantee) AND the
    # mix keep-draws (r16, adjudication fix: these were two separate
    # corpus scans, but neither predicate pushes to parquet — the cut
    # and the keep-draw both depend on join-derived columns — so the
    # filtered pool pass read every row anyway; conditional sums over
    # the unfiltered rows buy the second aggregate for free). A lang
    # with zero cut rows now yields a NULL _pool_tok row instead of
    # no row; the fill's left join produced the same NULL, so the
    # shortfall predicate is unchanged. Cached: ~n_langs rows, and
    # without the barrier the subtree re-derives (and re-scans) under
    # the fill branch.
    both = track_persist(
        joined.groupBy("lang").agg(
            F.sum(F.when(cut, F.col("_nt"))).alias("_pool_tok"),
            F.sum(F.when(F.col("_h") < F.col("keep_rate"), 1)
                  .otherwise(0)).alias("n_kept")))
    pool = both.select("lang", "_pool_tok")
    mix_agg = both.select("lang", "n_kept")
    shortfall = (F.col("_pool_tok").isNull()
                 | (F.col("_pool_tok") < _BUDGET_TOKENS))
    # scan 3: the fill — the window runs over POOL rows only (a
    # ~safety x budget slice per lang). One fused pass with the mix
    # aggregate was tried and rejected: it forced the cumsum window
    # over the WHOLE corpus (partitioned (lang, in_pool)), a
    # corpus-wide sort that costs more than the scan it saved —
    # measured 1.8x at sf0.1 and strictly worse at 100x.
    cand = (joined.join(F.broadcast(pool), "lang", "left")
            .filter(cut | shortfall))
    w = (Window.partitionBy("lang").orderBy("_h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fill_agg = (cand.withColumn("_cum", F.sum("_nt").over(w))
                .filter(F.col("_cum") - F.col("_nt") < _BUDGET_TOKENS)
                .groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_fill"),
                     F.sum("_nt").alias("fill_tok")))
    out = (mix_agg.join(fill_agg, "lang")
           .join(F.broadcast(rates), "lang"))
    mix = out.select(F.lit("mix").alias("part"), "lang",
                     F.col("n_total").alias("n1"),
                     F.col("n_kept").alias("n2"),
                     F.col("keep_rate").alias("v"))
    budget = out.select(F.lit("budget").alias("part"), "lang",
                        F.col("n_fill").alias("n1"),
                        F.col("fill_tok").alias("n2"),
                        (F.col("fill_tok").cast("double")
                         / _BUDGET_TOKENS).alias("v"))
    return mix.unionByName(budget)


def sample_token_budget(docs: DataFrame, budget_tokens: int,
                        by: str = "lang",
                        safety: float = 1.5) -> DataFrame:
    """Deterministic TOKEN-budget sampling: within each ``by`` group,
    keep documents in md5-hash order until the cumulative token count
    reaches ``budget_tokens`` — the pretraining-mix step that asks for
    "N tokens of each language", where rate-based sampling
    (``sample_stratified_hash``/``domain_mix_resample``) can only
    target row fractions. The doc straddling the boundary is KEPT
    (budgets are floors; a group under budget keeps everything). The
    draw order is the md5 unit draw, so re-running is reproducible.

    Scale (two-phase, zero driver actions): a per-group token total
    (one agg, broadcast back as a column) converts the budget to a
    keep-rate estimate; only docs whose hash draw falls under
    ``safety`` x that rate enter the EXACT fill — so the per-group
    window sort runs over ~safety x budget tokens' worth of rows, not
    the whole corpus (a corpus-wide partitionBy-sort would be the
    naive form's cost at 100 TB). ``safety`` guards the estimate
    against doc-length skew inside the hash prefix; groups where the
    rate reaches 1 skip the cut entirely.

    The floor is GUARANTEED, not probabilistic (ADVICE r14): the
    hash-cut pool's token mass is only ~safety x budget in
    EXPECTATION, so under heavy doc-length skew (one giant doc whose
    draw lands above the rate) a group's pool could under-fill even
    though the group has the tokens. A second broadcast-small
    aggregate totals each group's pool; a group whose pool total
    lands under the budget (while the group itself is over it) falls
    back to the FULL-group fill — still deterministic, still in-plan
    (two tiny aggregates, zero driver actions). Returns ``docs`` rows
    unchanged + ``n_tokens``."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    n_tok = F.size(F.split("text", " ")).cast("long")
    staged = docs.withColumn("_nt", n_tok).withColumn(
        "_h", _hash_unit(F.col("doc_id")))
    totals = (staged.groupBy(by)
              .agg(F.sum("_nt").alias("_grp_tok")))
    rate = F.least(F.lit(1.0),
                   F.lit(float(safety)) * F.lit(float(budget_tokens))
                   / F.col("_grp_tok"))
    cut = ((F.col("_grp_tok") <= budget_tokens) | (F.col("_h") < rate))
    joined = staged.join(F.broadcast(totals), by)
    pool = (joined.filter(cut).groupBy(by)
            .agg(F.sum("_nt").alias("_pool_tok")))
    shortfall = (F.col("_pool_tok").isNull()
                 | (F.col("_pool_tok") < budget_tokens))
    cand = (joined.join(F.broadcast(pool), by, "left")
            .filter(cut | shortfall))
    w = (Window.partitionBy(by).orderBy("_h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (cand.withColumn("_cum", F.sum("_nt").over(w))
           .filter(F.col("_cum") - F.col("_nt") < budget_tokens))
    return (out.select(*docs.columns, F.col("_nt").alias("n_tokens")))


def build_training_corpus(docs: DataFrame,
                          eval_docs: DataFrame | None = None,
                          min_words: int = _MIN_WORDS,
                          max_words: int = _MAX_WORDS,
                          min_stop_ratio: float = _MIN_STOP_RATIO,
                          min_unique_ratio: float = _MIN_UNIQUE_RATIO,
                          max_top2gram_frac: float = 0.20,
                          max_dup3gram_frac: float = 0.30,
                          dedup: bool = True,
                          keeper_score=None,
                          max_substring_dup_frac: float | None = None,
                          reference_docs: DataFrame | None = None,
                          max_perplexity: float | None = None,
                          budget_tokens: int | None = None,
                          budget_by: str = "lang",
                          chunk_max_tokens: int | None = None,
                          chunk_overlap: int = 64,
                          pack_budget: int | None = None,
                          n_shards: int | None = None) -> DataFrame:
    """The one-call curation pipeline (r12) — every apply step the
    module family ships, composed in the order a production run
    executes them, cheapest-narrowest first:

    1. quality gates (length bounds, stopword floor, unique-word floor
       — the ``quality_filter_chain`` ladder as a filter);
    2. Gopher repetition gates (most-frequent-2-gram and duplicate-
       3-gram fraction ceilings — text_analysis' per-row fold, so
       steps 1-2 are ONE narrow scan, no shuffle);
    3. optional reference-LM perplexity gate (``max_perplexity`` +
       ``reference_docs`` — :func:`~.text_analysis.perplexity_filter`,
       the CCNet-style clean-text signal);
    4. eval-set decontamination (:func:`~.curation.
       decontaminate_survivors`, when ``eval_docs`` is given);
    5. optional exact-substring dedup (``max_substring_dup_frac``:
       drop docs whose duplicated >= 32-token-window coverage exceeds
       the ceiling — :func:`~.dedup.exact_substring_survivors`);
    6. near-dup dedup (MinHash-LSH pairs -> connected components ->
       :func:`~.dedup.dedup_survivors`), run LAST so the quadratic-ish
       candidate work only sees already-thinned docs;
       ``keeper_score`` (a Column over the doc columns, e.g.
       ``F.length("text")``) switches the per-cluster keeper from the
       min-id canonical to the max-score row
       (:func:`~.dedup.dedup_survivors_by` — keep the longest/cleanest
       near-dup, the RefinedWeb-style rule);
    7. optional per-group token budget (``budget_tokens`` +
       ``budget_by`` — :func:`sample_token_budget`, r15): keep
       documents in deterministic hash order until each group reaches
       the budget ("N tokens of each language", the pretraining-mix
       ask). Runs AFTER dedup (budgets count unique content, not
       copies) and BEFORE chunking (the straddle-doc floor semantics
       are per-document; chunk-level cutting would split documents
       mid-budget). The returned ``n_tokens`` column is dropped — the
       chunker re-derives token counts per chunk;
    8. optional long-document windowing (``chunk_max_tokens`` —
       :func:`chunk_documents`, post-gates/post-dedup so chunking
       never multiplies the dedup candidate work, pre-shard so chunks
       co-shard with their doc): rows become fixed-budget chunks with
       ``chunk_overlap`` tokens of shared context;
    9. optional greedy pack assignment over the chunks
       (``pack_budget``, requires chunking): the ``pack_sequences``
       labeling — (bucket, pack_seq) columns where chunks fill
       pack_budget-token packs in (doc_id, chunk_idx) order WITHIN
       doc-hash buckets, so the running-total window never needs a
       global sort;
    10. optional deterministic ``shard`` column (md5 hash — adding
        data never moves existing rows between shards).

    Input: (doc_id, lang, text). Output: surviving rows unchanged
    (+ ``shard``), or — with ``chunk_max_tokens`` — fixed-budget
    training rows (doc_id, lang, chunk_idx, n_tokens, chunk
    [, bucket, pack_seq] [, shard]). Every step is individually
    oracle- or planted-case-tested; this composition is itself
    planted-case tested (tests/test_training_data.py)."""
    from ..tables import spread_frame
    from .curation import decontaminate_survivors
    from .dedup import (_minhash_verified_pairs, connected_components,
                        dedup_survivors)
    from .text_analysis import (_g3_from_g2, _rep_gram_hashes,
                                _run_length_tally, _word_hashes)

    # Staged narrow projections (r13): the word array, the per-word
    # hash array, the 2-gram hash array (from which the 3-gram hashes
    # chain), and each gram tally are materialized as COLUMNS so
    # every later reference is a cheap attribute read. The previous
    # form referenced the split inside one filter predicate ~6 times
    # and each tally twice — in interpreted evaluation every textual
    # reference re-evaluates its subtree (Catalyst only refuses to
    # DUPLICATE non-cheap exprs across projections; inside one
    # expression the duplication was already written down). Tallies
    # ride the hashed-gram form (same counts, measured 0.64x — see
    # text_analysis._rep_gram_hashes). spread_frame rebalances a
    # narrower-than-the-cluster input once up front (no-op at
    # warehouse scale) so the HOF-heavy gate scan uses every core.
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    docs = spread_frame(docs.sparkSession, docs)
    staged = (docs.withColumn("_w", F.split("text", " "))
              .withColumn("_hw", _word_hashes(F.col("_w")))
              .withColumn("_g2", _rep_gram_hashes(F.col("_hw"), 2))
              .withColumn("_t2", _run_length_tally(F.col("_g2"), "long"))
              .withColumn("_t3", _run_length_tally(
                  _g3_from_g2(F.col("_g2"), F.col("_hw")), "long")))
    n_words = F.size("_hw")
    stop_ratio = (F.size(F.filter(F.col("_w"), lambda x:
                                  F.array_contains(stop_arr, x)))
                  * F.lit(1.0) / n_words)
    uniq_ratio = (F.size(F.array_distinct("_hw"))
                  * F.lit(1.0) / n_words)
    t2, t3 = F.col("_t2"), F.col("_t3")
    # NULL tallies (docs too short for the n-gram) pass the repetition
    # gates — the length gate already governs short docs.
    rep_ok = (
        F.coalesce(t2["top"].cast("double") / t2["total"]
                   <= max_top2gram_frac, F.lit(True))
        & F.coalesce(t3["dup"].cast("double") / t3["total"]
                     <= max_dup3gram_frac, F.lit(True)))
    kept = (staged.filter(
        (n_words >= min_words) & (n_words <= max_words)
        & (stop_ratio >= min_stop_ratio)
        & (uniq_ratio >= min_unique_ratio) & rep_ok)
        .drop("_w", "_hw", "_g2", "_t2", "_t3"))
    if max_perplexity is not None:
        # reference-LM quality gate (CCNet-style): runs right after the
        # heuristic gates, before the cross-document stages
        if reference_docs is None:
            raise ValueError(
                "max_perplexity requires reference_docs (the clean "
                "slice the bigram LM trains on)")
        from .text_analysis import perplexity_filter
        kept = perplexity_filter(kept, reference_docs, max_perplexity)
    if eval_docs is not None:
        kept = decontaminate_survivors(kept, eval_docs)
    if max_substring_dup_frac is not None:
        # exact verbatim spans first (the strongest signal), fuzzy
        # MinHash last — both cross-document stages see gate-thinned
        # docs only. Append-only deployments run this same ceiling
        # per-trigger instead via the "substring" index kind
        # (dedup_index.apply_substring_maintenance_batch).
        from .dedup import exact_substring_survivors
        kept = exact_substring_survivors(
            kept, max_dup_frac=max_substring_dup_frac)
    if dedup:
        memb = connected_components(_minhash_verified_pairs(kept))
        if keeper_score is not None:
            from .dedup import dedup_survivors_by
            kept = dedup_survivors_by(kept, memb, keeper_score)
        else:
            kept = dedup_survivors(kept, memb)
    if budget_tokens is not None:
        if budget_by not in kept.columns:
            raise ValueError(
                f"budget_by column {budget_by!r} not in the corpus "
                f"columns {kept.columns}")
        kept = (sample_token_budget(kept, budget_tokens, by=budget_by)
                .drop("n_tokens"))
    if pack_budget is not None and chunk_max_tokens is None:
        raise ValueError(
            "pack_budget requires chunk_max_tokens: packing assigns "
            "FIXED-budget rows, which only chunking guarantees")
    if pack_budget is not None and pack_budget < chunk_max_tokens:
        # ADVICE r14: a single chunk may carry up to chunk_max_tokens
        # tokens, so a smaller pack budget cannot hold even one chunk
        # — the straddling chunk would overflow EVERY pack it starts.
        # Note pack token totals count each chunk's full n_tokens,
        # INCLUDING the chunk_overlap tokens shared with its
        # predecessor (contiguous-fill semantics over training rows —
        # the overlap is real model input, not an accounting artifact).
        raise ValueError(
            f"pack_budget ({pack_budget}) must be >= chunk_max_tokens "
            f"({chunk_max_tokens}): a pack must hold at least one "
            "full chunk")
    if chunk_max_tokens is not None:
        kept = chunk_documents(kept, max_tokens=chunk_max_tokens,
                               overlap=chunk_overlap)
        if pack_budget is not None:
            wnd = (Window.partitionBy("bucket")
                   .orderBy("doc_id", "chunk_idx")
                   .rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))
            kept = (kept.withColumn(
                "bucket", F.col("doc_id") % _PACK_BUCKETS)
                .withColumn("_cum", F.sum("n_tokens").over(wnd))
                .withColumn(
                    "pack_seq",
                    F.floor((F.col("_cum") - F.col("n_tokens"))
                            / F.lit(float(pack_budget))))
                .drop("_cum"))
    if n_shards:
        kept = kept.withColumn(
            "shard",
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                               1, 15), 16, 10).cast("long") % n_shards)
    return kept


def chunk_documents(docs: DataFrame, max_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Split long documents into training-window chunks with token
    overlap — the step between curation and packing when documents
    exceed the model's sequence budget: successive chunks start every
    ``max_tokens - overlap`` tokens, so every token appears in at
    least one chunk and consecutive chunks share ``overlap`` tokens of
    context (the standard long-document windowing).

    Output: (every input column except ``text``, chunk_idx, n_tokens,
    chunk) — non-text columns (doc_id, lang, ...) ride through the
    projection so pipeline composition never needs a re-attach join.
    chunk_idx is 0-based and deterministic; a doc at or under the
    budget yields exactly itself as chunk 0; the final chunk is the
    (possibly shorter) tail. Re-chunking the same corpus is
    reproducible by construction and appending docs never changes
    other docs' chunks.
    A start s > 0 is emitted only when it contributes at least one
    NEW token (s + overlap < n): without that cap, any doc with
    (n-1) mod step < overlap grew a tail chunk wholly contained in
    its predecessor — duplicated training text from the chunker in a
    dedup-focused pipeline (ADVICE r13).

    Scale: one narrow projection builds each doc's chunk array (HOF
    slice over the split words — no shuffle), one generate emits the
    chunks (posexplode_outer: an inner explode would infer a
    size(chunks) > 0 filter that re-evaluates the chunk build per row
    — the r13 generate lesson). Chunk volume is corpus tokens x
    (1 + overlap/(max_tokens-overlap)), the documented overlap tax."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    step = max_tokens - overlap
    carry = [c for c in docs.columns if c != "text"]
    w = F.split("text", " ")
    staged = docs.select(*carry, w.alias("_w"))
    n = F.size("_w")
    # chunk starts: 0, step, 2*step, ... while start + overlap < n
    # (and at least one chunk for the empty-doc edge); sequence is
    # inclusive, so the last start is the largest multiple of step
    # <= max(n - overlap - 1, 0). Coverage still holds: consecutive
    # multiples are step apart, so last_start > n - overlap - 1 - step
    # = n - max_tokens - 1, i.e. last_start + max_tokens >= n.
    m = F.greatest(n - overlap - 1, F.lit(0))
    last_start = m - F.pmod(m, F.lit(step))
    chunks = F.transform(
        F.sequence(F.lit(0), last_start, F.lit(step)),
        lambda s: F.struct(
            (s / step).cast("long").alias("chunk_idx"),
            F.slice(F.col("_w"), s + 1, max_tokens).alias("toks")))
    out = (staged.select(*carry, F.posexplode_outer(chunks)
                         .alias("_pos", "c"))
           .filter(F.col("c").isNotNull()))
    return out.select(
        *carry, F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.toks").alias("n_tokens"),
        F.array_join("c.toks", " ").alias("chunk"))
