"""Text analysis over the `documents` table: language-ID (marker-word
heuristic), quality scoring (length/stopword/char ratios), token counting
(whitespace + BPE-ish regex), and content fingerprinting.

All per-row arithmetic (counts, ratios) — deterministic across engines
without rounding. Regexes are kept to the syntax subset shared by Java
regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..catalog import register
from ..tables import load_spread

# tiny marker lexicons per language (n-gram heuristic stand-in)
_MARKERS = {
    "en": ["the", "fast", "slow", "value", "key"],
    "de": ["der", "die", "das", "und", "nicht"],
    "es": ["el", "la", "los", "que", "con"],
    "fr": ["le", "les", "des", "une", "est"],
    "zh": ["de", "shi", "bu", "le", "ren"],
}

_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


def _hits_expr(words_col, markers):
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words_col, lambda w: F.array_contains(arr, w)))


def _sql_hits(markers):
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter(w, x -> list_contains({lst}, x)))"


# The five text_* operators register as ONE catalog entry (text_battery,
# defined at the bottom) for the driver 50-row-cap reason: the driver's
# CORRECTNESS harness records at most 50 queries, so each operator keeps
# its full Spark plan and full oracle SQL, melted to a shared long-format
# schema (part, k1, metric, vd, vs) and concatenated shuffle-free.

_SQL_LANGUAGE_ID = f"""
    WITH toks AS (
      SELECT doc_id, lang AS labeled_lang, string_split(text, ' ') AS w
      FROM documents),
    scored AS (
      SELECT doc_id, labeled_lang, len(w) AS n_words,
             {_sql_hits(_MARKERS['en'])} AS hits_en,
             {_sql_hits(_MARKERS['de'])} AS hits_de,
             {_sql_hits(_MARKERS['es'])} AS hits_es,
             {_sql_hits(_MARKERS['fr'])} AS hits_fr,
             {_sql_hits(_MARKERS['zh'])} AS hits_zh
      FROM toks),
    pred AS (
      SELECT *, CASE
        WHEN hits_en >= hits_de AND hits_en >= hits_es
             AND hits_en >= hits_fr AND hits_en >= hits_zh THEN 'en'
        WHEN hits_de >= hits_es AND hits_de >= hits_fr
             AND hits_de >= hits_zh THEN 'de'
        WHEN hits_es >= hits_fr AND hits_es >= hits_zh THEN 'es'
        WHEN hits_fr >= hits_zh THEN 'fr' ELSE 'zh' END AS predicted_lang
      FROM scored)
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs,
           CAST(SUM(hits_en) AS BIGINT) AS total_marker_hits
    FROM pred GROUP BY labeled_lang, predicted_lang
"""


def text_language_id(spark, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-word hit counts per language,
    argmax with deterministic tie order, confusion counts vs label."""
    docs = load_spread(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        *[_hits_expr(words, m).alias(f"hits_{k}")
          for k, m in _MARKERS.items()])
    h = {k: F.col(f"hits_{k}") for k in _MARKERS}
    pred = (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["es"])
               & (h["en"] >= h["fr"]) & (h["en"] >= h["zh"]), "en")
        .when((h["de"] >= h["es"]) & (h["de"] >= h["fr"])
              & (h["de"] >= h["zh"]), "de")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["zh"]), "es")
        .when(h["fr"] >= h["zh"], "fr").otherwise("zh"))
    return (scored.withColumn("predicted_lang", pred)
            .groupBy("labeled_lang", "predicted_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("hits_en").alias("total_marker_hits")))


_SQL_QUALITY_SCORE = f"""
    WITH feats AS (
      SELECT doc_id, lang, length(text) AS n_chars2,
             len(string_split(text, ' ')) AS n_words,
             len(list_filter(string_split(text, ' '),
                 x -> list_contains(
                   [{", ".join(repr(s) for s in _STOPWORDS)}], x)))
               AS n_stop,
             length(regexp_replace(text, '[a-z ]', '', 'g')) AS n_nonalpha
      FROM documents)
    SELECT doc_id, lang, n_chars2, n_words,
           CAST(n_chars2 AS DOUBLE) / n_words AS avg_word_len,
           CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           CAST(n_nonalpha AS DOUBLE) / n_chars2 AS nonalpha_ratio,
           CASE WHEN n_words BETWEEN 50 AND 1000
                 AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
                THEN 1 ELSE 0 END AS quality_pass
    FROM feats
"""


def text_quality_score(spark, sf_dir: str) -> DataFrame:
    """Quality scoring: length, avg word length, stopword ratio,
    non-alpha ratio, pass/fail gate."""
    docs = load_spread(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    n_chars2 = F.length("text")
    n_nonalpha = F.length(F.regexp_replace(F.col("text"), "[a-z ]", ""))
    stop_ratio = n_stop.cast("double") / n_words
    return docs.select(
        "doc_id", "lang", n_chars2.alias("n_chars2"),
        n_words.alias("n_words"),
        (n_chars2.cast("double") / n_words).alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (n_nonalpha.cast("double") / n_chars2).alias("nonalpha_ratio"),
        F.when((n_words >= 50) & (n_words <= 1000) & (stop_ratio >= 0.01),
               1).otherwise(0).alias("quality_pass"))


_SQL_TOKEN_STATS = """
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS bpe_ish_tokens,
           length(text) AS n_bytes2,
           CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS bytes_per_token
    FROM documents
"""


def text_token_stats(spark, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split vs BPE-ish regex segmentation."""
    docs = load_spread(spark, sf_dir, "documents")
    bpe = F.size(F.expr(
        "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        F.length("text").alias("n_bytes2"),
        (F.length("text").cast("double") / bpe).alias("bytes_per_token"))


_SQL_FINGERPRINT = """
    WITH fp AS (
      SELECT doc_id, source,
             md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fingerprint
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_distinct,
           MIN(fingerprint) AS min_fp
    FROM fp GROUP BY source
"""


def text_fingerprint(spark, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-content md5, per-source
    distinct counts (shard-level dedup accounting)."""
    docs = load_spread(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), " +", " ")))
    return (docs.select("doc_id", "source", fp.alias("fingerprint"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("fingerprint").alias("n_distinct"),
                 F.min("fingerprint").alias("min_fp")))


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction with per-kind accounting)
# ---------------------------------------------------------------------------

# The synthetic corpus has no PII, so (like the dedup near-dup injection)
# deterministic contact strings are appended to every 5th doc — the
# operator then has real redactions to demonstrate and the oracle can
# rebuild the identical corpus. Patterns stay in the Java-regex ∩ RE2
# syntax subset.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

_SQL_PII_DOCS = """
    pii_docs AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 5 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example or 555-01' || CAST(doc_id % 10 AS VARCHAR)
                    || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE text END AS text
      FROM documents)
"""


def _docs_with_pii(spark, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    contact = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@mail.example or 555-01"),
        (F.col("doc_id") % 10).cast("string"), F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    return docs.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 5 == 0, contact)
        .otherwise(F.col("text")).alias("text"))


_SQL_PII_SCRUB = f"""
    WITH {_SQL_PII_DOCS},
    scrubbed AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
             regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>',
                                           'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS clean
      FROM pii_docs)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_redacted,
           CAST(SUM(strlen(clean)) AS BIGINT) AS sum_len_clean,
           COUNT(DISTINCT md5(clean)) AS n_distinct_clean
    FROM scrubbed GROUP BY lang
"""


def text_pii_scrub(spark, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/phone regex redaction with per-kind
    accounting, rolled up per language. Narrow per-row regex work
    (pushed-down 3-column scan); the 5-key rollup is the only shuffle.
    The md5-of-clean-text distinct count pins the exact redacted
    output, not just the counts."""
    docs = _docs_with_pii(spark, sf_dir)
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>")
    scrubbed = docs.select(
        "lang",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RE)).alias("n_phones"),
        clean.alias("clean"))
    return (scrubbed.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_emails").alias("n_emails"),
                 F.sum("n_phones").alias("n_phones"),
                 F.sum(F.when(F.col("n_emails") + F.col("n_phones") > 0, 1)
                       .otherwise(0)).alias("n_docs_redacted"),
                 F.sum(F.length("clean")).alias("sum_len_clean"),
                 F.count_distinct(F.md5("clean"))
                 .alias("n_distinct_clean")))


# ---------------------------------------------------------------------------
# text_battery — all five operators as one long-format catalog entry
# ---------------------------------------------------------------------------

_SQL_REPETITION = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    base AS (SELECT doc_id, len(w) AS n_words,
                    len(list_distinct(w)) AS n_distinct_words FROM w),
    g2 AS (SELECT doc_id,
                  unnest(CASE WHEN len(w) >= 2 THEN
                    list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])
                  ELSE [] END) AS gram FROM w),
    c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
    s2 AS (SELECT doc_id, SUM(c) AS n2grams, MAX(c) AS top2_n,
                  SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup2_n
           FROM c2 GROUP BY 1),
    g3 AS (SELECT doc_id,
                  unnest(CASE WHEN len(w) >= 3 THEN
                    list_transform(range(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i+1]
                                        || ' ' || w[i+2])
                  ELSE [] END) AS gram FROM w),
    c3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
    s3 AS (SELECT doc_id, SUM(c) AS n3grams, MAX(c) AS top3_n,
                  SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3_n
           FROM c3 GROUP BY 1)
    SELECT b.doc_id, b.n_words, b.n_distinct_words,
           1.0 - CAST(b.n_distinct_words AS DOUBLE) / b.n_words
             AS dup_word_frac,
           s2.n2grams, s2.top2_n, s2.dup2_n,
           CAST(s2.top2_n AS DOUBLE) / s2.n2grams AS top2_frac,
           CAST(s2.dup2_n AS DOUBLE) / s2.n2grams AS dup2_frac,
           s3.n3grams, s3.top3_n, s3.dup3_n,
           CAST(s3.top3_n AS DOUBLE) / s3.n3grams AS top3_frac,
           CAST(s3.dup3_n AS DOUBLE) / s3.n3grams AS dup3_frac
    FROM base b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
"""


def _rep_grams(words_col, n: int) -> F.Column:
    """Word n-grams WITHOUT the per-doc distinct (repetition is the
    thing being measured), built as ``zip_with`` over n shifted slices
    of the words array. The lambda bodies touch only ELEMENTS — the
    words array is evaluated once per slice argument, never inside a
    lambda, which matters enormously in interpreted (codegen-off)
    evaluation where a lambda-body subtree re-evaluates per element (a
    sequence->slice formulation re-split the text per gram: measured
    8x the whole battery's cost)."""
    s = F.size(words_col)
    cat = lambda a, b: F.concat_ws(" ", a, b)  # noqa: E731
    if n == 2:
        grams = F.zip_with(F.slice(words_col, 1, s - 1),
                           F.slice(words_col, 2, s - 1), cat)
    elif n == 3:
        grams = F.zip_with(
            F.zip_with(F.slice(words_col, 1, s - 2),
                       F.slice(words_col, 2, s - 2), cat),
            F.slice(words_col, 3, s - 2), cat)
    else:
        raise ValueError(f"n must be 2 or 3, got {n}")
    return F.when(s >= n, grams).otherwise(
        F.array().cast("array<string>"))


def _run_length_tally(grams_col, elem_type: str = "string") -> F.Column:
    """struct(total, top, dup) gram-frequency tally as a PER-ROW fold:
    sort the gram array, then ONE pass counting runs — total grams,
    the longest run (the most frequent gram's count), and the number
    of grams inside runs of length >= 2. Zero exchange, zero explode:
    the whole repetition part stays a narrow projection (the explode +
    (doc_id, gram) hash-aggregate form measured 2.4x the battery cost
    at sf0.1; the counts are integers, so the DuckDB oracle keeps the
    plain relational form and still hash-matches). The gram array is
    referenced exactly ONCE (total rides in the accumulator) and the
    NULL-init prev means the first gram never matches."""
    z = F.struct(
        F.lit(None).cast(elem_type).alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("total"))

    def step(acc, x):
        nr = F.when(x == acc["prev"], acc["run"] + 1) \
            .otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), nr.alias("run"),
            F.greatest(acc["top"], nr).alias("top"),
            (acc["dup"] + F.when(nr == 2, 2).when(nr > 2, 1)
             .otherwise(0)).alias("dup"),
            (acc["total"] + 1).alias("total"))

    def finish(acc):
        return F.when(
            acc["total"] > 0,
            F.struct(acc["total"].alias("total"), acc["top"].alias("top"),
                     acc["dup"].alias("dup")))

    return F.aggregate(F.array_sort(grams_col), z, step, finish)


def _word_hashes(words_col) -> F.Column:
    """xxhash64 per word — hash each word string ONCE; every gram
    downstream combines the LONGS (fixed 8-byte hashing) instead of
    re-traversing word strings per gram (each word otherwise gets
    string-hashed ~5x across the 2- and 3-gram builds)."""
    return F.transform(words_col, lambda x: F.xxhash64(x))


def _rep_gram_hashes(hw_col, n: int) -> F.Column:
    """Word n-gram HASHES from the pre-hashed word array: the same
    zip_with-over-shifted-slices shape as :func:`_rep_grams`, but the
    element op is xxhash64 over longs (3-grams chain the 2-gram hash
    with the third word's hash) — no per-gram string allocation, long
    sort keys, long run compares.

    The tallies only need equality runs, so hashed grams produce
    IDENTICAL counts unless two distinct grams of one doc collide in
    64 bits — P ~ m^2/2^65 per doc (~3e-11 at 1k grams), ~5e-2
    expected collisions across a trillion-doc corpus, and a collision
    perturbs one doc's top/dup count by one run merge; the exact
    string form (:func:`_rep_grams` + string tally) remains as the
    reference and is differential-pinned in
    tests/test_text_repetition.py. VERDICT r12 item 7: the measured
    A/B (BENCH_NOTES r13) chose this over the proposed single-fused
    fold (1.25x SLOWER than two folds — per-element cost dominates,
    not per-pass overhead), a packed single-long accumulator (1.07x),
    and a long-keyed fused sort (1.14x)."""
    s = F.size(hw_col)
    if n == 2:
        grams = F.zip_with(F.slice(hw_col, 1, s - 1),
                           F.slice(hw_col, 2, s - 1),
                           lambda a, b: F.xxhash64(a, b))
    elif n == 3:
        grams = F.zip_with(
            F.zip_with(F.slice(hw_col, 1, s - 2),
                       F.slice(hw_col, 2, s - 2),
                       lambda a, b: F.xxhash64(a, b)),
            F.slice(hw_col, 3, s - 2),
            lambda h, c: F.xxhash64(h, c))
    else:
        raise ValueError(f"n must be 2 or 3, got {n}")
    return F.when(s >= n, grams).otherwise(F.array().cast("array<long>"))


def _g3_from_g2(g2_col, hw_col) -> F.Column:
    """3-gram hashes chained FROM an already-materialized 2-gram hash
    array: hash3[i] = xxhash64(hash2[i], w[i+2]) — identical values to
    ``_rep_gram_hashes(hw, 3)`` by construction (same chain), but the
    (a, b) pair hashes are reused instead of recomputed (one fewer
    xxhash64 pass per row; measured 0.96x in scripts/rep_tally_ab.py)."""
    s = F.size(hw_col)
    return F.when(s >= 3, F.zip_with(
        F.slice(g2_col, 1, s - 2), F.slice(hw_col, 3, s - 2),
        lambda h, c: F.xxhash64(h, c))) \
        .otherwise(F.array().cast("array<long>"))


def text_repetition(spark, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al.
    2021 §A1.1, public paper): duplicate-word fraction plus, per
    n ∈ {2, 3}, the total/most-frequent/duplicated word-n-gram counts
    and fractions — the standard curation pass that catches
    boilerplate and degenerate repetition BEFORE cross-document dedup.

    Scale: stacked narrow projections over one scan — no explode, no
    keyed shuffle (load_spread adds one round-robin rebalance ONLY
    when the scan has fewer splits than cores; a no-op at warehouse
    scale). The first projection materializes the per-word hash array
    ONCE (:func:`_word_hashes`; Catalyst keeps the projections
    separate because the transform is multi-referenced and non-cheap,
    so the hashes are computed once per row, not once per reference);
    the second stages the 2-gram hash array, from which the 3-gram
    hashes are chained (:func:`_g3_from_g2`); the third runs the
    distinct count and both gram tallies over LONGS — the r13 form
    that A/B-measured 0.64x the all-string form at identical counts
    (BENCH_NOTES r13; collision bound in _rep_gram_hashes'
    docstring). Docs too short for an n-gram carry NULL n-gram
    metrics (both engines)."""
    docs = load_spread(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    hashed = docs.select("doc_id", _word_hashes(words).alias("hw"))
    hw = F.col("hw")
    staged = hashed.select(
        "doc_id", "hw", _rep_gram_hashes(hw, 2).alias("g2"))
    base = staged.select(
        "doc_id", F.size(hw).alias("n_words"),
        F.size(F.array_distinct(hw)).alias("n_distinct_words"),
        _run_length_tally(F.col("g2"), "long").alias("_t2"),
        _run_length_tally(_g3_from_g2(F.col("g2"), hw), "long")
        .alias("_t3"))
    return base.select(
        "doc_id", "n_words", "n_distinct_words",
        (F.lit(1.0) - F.col("n_distinct_words").cast("double")
         / F.col("n_words")).alias("dup_word_frac"),
        F.col("_t2.total").alias("n2grams"),
        F.col("_t2.top").alias("top2_n"),
        F.col("_t2.dup").alias("dup2_n"),
        (F.col("_t2.top").cast("double") / F.col("_t2.total"))
        .alias("top2_frac"),
        (F.col("_t2.dup").cast("double") / F.col("_t2.total"))
        .alias("dup2_frac"),
        F.col("_t3.total").alias("n3grams"),
        F.col("_t3.top").alias("top3_n"),
        F.col("_t3.dup").alias("dup3_n"),
        (F.col("_t3.top").cast("double") / F.col("_t3.total"))
        .alias("top3_frac"),
        (F.col("_t3.dup").cast("double") / F.col("_t3.total"))
        .alias("dup3_frac"))


def _melt_df(df: DataFrame, part: str, k1, num_metrics, str_metrics=()):
    """Melt named columns to long format (part, k1, metric, vd, vs).

    Zero-shuffle: one generate (explode of a literal-size array) per
    branch; every metric value rides through unchanged, so the driver's
    value hash still pins each operator's full per-row output.
    """
    entries = [F.struct(F.lit(m).alias("metric"),
                        F.col(m).cast("double").alias("vd"),
                        F.lit(None).cast("string").alias("vs"))
               for m in num_metrics]
    entries += [F.struct(F.lit(m).alias("metric"),
                         F.lit(None).cast("double").alias("vd"),
                         F.col(m).cast("string").alias("vs"))
                for m in str_metrics]
    return (df.select(F.lit(part).alias("part"),
                      k1.cast("string").alias("k1"),
                      F.explode(F.array(*entries)).alias("m"))
            .select("part", "k1", F.col("m.metric").alias("metric"),
                    F.col("m.vd").alias("vd"), F.col("m.vs").alias("vs")))


def _melt_sql(part: str, sub_sql: str, k1_expr: str,
              num_metrics, str_metrics=()) -> str:
    out = []
    for m in num_metrics:
        out.append(
            f"SELECT '{part}' AS part, CAST({k1_expr} AS VARCHAR) AS k1,"
            f" '{m}' AS metric, CAST({m} AS DOUBLE) AS vd,"
            f" CAST(NULL AS VARCHAR) AS vs FROM ({sub_sql}) t")
    for m in str_metrics:
        out.append(
            f"SELECT '{part}' AS part, CAST({k1_expr} AS VARCHAR) AS k1,"
            f" '{m}' AS metric, CAST(NULL AS DOUBLE) AS vd,"
            f" CAST({m} AS VARCHAR) AS vs FROM ({sub_sql}) t")
    return "\nUNION ALL\n".join(out)


_BATTERY_METRICS = {
    "langid": dict(k1="labeled_lang || '->' || predicted_lang",
                   num=("n_docs", "total_marker_hits")),
    "quality": dict(k1="doc_id",
                    num=("n_chars2", "n_words", "avg_word_len",
                         "stopword_ratio", "nonalpha_ratio",
                         "quality_pass"),
                    str_=("lang",)),
    "tokens": dict(k1="doc_id",
                   num=("ws_tokens", "bpe_ish_tokens", "n_bytes2",
                        "bytes_per_token")),
    "fingerprint": dict(k1="source", num=("n_docs", "n_distinct"),
                        str_=("min_fp",)),
    "pii": dict(k1="lang",
                num=("n_docs", "n_emails", "n_phones", "n_docs_redacted",
                     "sum_len_clean", "n_distinct_clean")),
    "repetition": dict(k1="doc_id",
                       num=("n_words", "n_distinct_words",
                            "dup_word_frac", "n2grams", "top2_n",
                            "dup2_n", "top2_frac", "dup2_frac",
                            "n3grams", "top3_n", "dup3_n", "top3_frac",
                            "dup3_frac")),
}

_BATTERY_SQL = {
    "langid": _SQL_LANGUAGE_ID,
    "quality": _SQL_QUALITY_SCORE,
    "tokens": _SQL_TOKEN_STATS,
    "fingerprint": _SQL_FINGERPRINT,
    "pii": _SQL_PII_SCRUB,
    "repetition": _SQL_REPETITION,
}


@register(
    "text_battery",
    oracle="\nUNION ALL\n".join(
        _melt_sql(part, _BATTERY_SQL[part], spec["k1"], spec["num"],
                  spec.get("str_", ()))
        for part, spec in _BATTERY_METRICS.items()),
    tags=("text", "llm-data", "langid", "quality", "tokens",
          "fingerprint", "pii", "repetition"),
    doc="All six text-analysis operators (language-ID, quality score, "
        "token stats, fingerprint, PII scrub, Gopher-style repetition "
        "filters) as one catalog entry, "
        "melted to a shared (part, k1, metric, vd, vs) long format so "
        "each operator's full per-row output stays in the driver's "
        "value hash (driver 50-row-cap consolidation). Each branch "
        "keeps its full narrow plan; the melt is a per-row explode of "
        "a literal-size array — no extra shuffle.",
)
def text_battery(spark, sf_dir: str) -> DataFrame:
    branches = {
        "langid": text_language_id(spark, sf_dir).withColumn(
            # F.concat (not concat_ws) so a NULL lang propagates to a
            # NULL key, matching the oracle's `||` semantics exactly.
            "k", F.concat(F.col("labeled_lang"), F.lit("->"),
                          F.col("predicted_lang"))),
        "quality": text_quality_score(spark, sf_dir).withColumn(
            "k", F.col("doc_id")),
        "tokens": text_token_stats(spark, sf_dir).withColumn(
            "k", F.col("doc_id")),
        "fingerprint": text_fingerprint(spark, sf_dir).withColumn(
            "k", F.col("source")),
        "pii": text_pii_scrub(spark, sf_dir).withColumn(
            "k", F.col("lang")),
        "repetition": text_repetition(spark, sf_dir).withColumn(
            "k", F.col("doc_id")),
    }
    out = None
    for part, spec in _BATTERY_METRICS.items():
        melted = _melt_df(branches[part], part, F.col("k"),
                          spec["num"], spec.get("str_", ()))
        out = melted if out is None else out.unionByName(melted)
    return out
