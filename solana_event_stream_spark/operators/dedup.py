"""Deduplication operators over the `documents` table — the training-data
pipeline surface: exact (hash-groupBy), MinHash+LSH (shingle -> minhash ->
band -> bucket-join -> verify), SimHash (hamming prefix-blocked), n-gram
Jaccard, embedding-cosine near-dup.

Everything is built from JVM-side higher-order functions (transform /
aggregate / array_*) — no Python UDFs — so the whole path is
Catalyst-planned and Arrow-free.

Scale design (100 TB):
- every pairwise operator is BLOCKED (LSH band buckets, simhash prefix,
  (lang, length-bucket)) so the candidate join is an equi-join on the
  block key, never a cross join;
- signatures are computed per-row (narrow), the only shuffles are the
  block-key joins; skewed blocks are handled by AQE skew-join;
- verification (true Jaccard / cosine) runs only on candidates.

Determinism: md5 is the cross-engine hash (identical hex in Spark and
DuckDB); Jaccard uses |A∩B| / (|A|+|B|-|A∩B|) so both engines divide the
same integers; dot products use ordered folds (verified bitwise-equal
across engines).

The input corpus is `documents` unioned with deterministic near-dup
copies (doc_id+1000000, one appended token) so the operators demonstrably
find duplicates on the synthetic data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..catalog import register
from ..tables import load_spread, load_table

N_HASHES = 12
N_BANDS = 3
ROWS_PER_BAND = 4  # P(candidate) = J^4 per band: steep S-curve, few false
                   # candidates on loosely-similar corpora

# SQL fragment shared by all oracles: corpus with injected near-dups
# (one appended token; found by the similarity operators) AND exact
# copies (identical text; found by dedup_exact)
DOCS_CTE = """
    docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text || ' xdup' AS text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text
      FROM documents WHERE doc_id % 25 = 0
    )
"""


def docs_with_dups(spark, sf_dir: str) -> DataFrame:
    """Corpus with injected near-dups and exact copies — via ONE scan.

    The previous 3-branch union re-read documents.parquet once per
    branch (the r13 scan audit flagged it; at warehouse scale that is
    three full-corpus reads for every dedup query, and the simhash
    query inherited six). Now each row emits its variants through one
    conditionally-sized array concat + explode: one scan, ~1.14x rows
    out of the Generate (1 + 1/10 + 1/25), no repeated IO."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    orig = F.array(F.struct(F.col("doc_id").alias("doc_id"),
                            F.col("text").alias("text")))
    near = F.when(
        F.col("doc_id") % 10 == 0,
        F.array(F.struct((F.col("doc_id") + 1000000).alias("doc_id"),
                         F.concat(F.col("text"), F.lit(" xdup"))
                         .alias("text")))) \
        .otherwise(F.array().cast("array<struct<doc_id:long,text:string>>"))
    exact = F.when(
        F.col("doc_id") % 25 == 0,
        F.array(F.struct((F.col("doc_id") + 2000000).alias("doc_id"),
                         F.col("text").alias("text")))) \
        .otherwise(F.array().cast("array<struct<doc_id:long,text:string>>"))
    exploded = (base.select(F.explode(F.concat(orig, near, exact))
                            .alias("v"))
                .select("v.doc_id", "v.text"))
    # The small-SF parquet reads as 1-3 splits; the heavy per-row feature
    # extraction downstream (shingles, per-word hashes) must not inherit
    # that. One cheap shuffle of the raw (id, text) rows spreads the
    # corpus across all cores — at real scale the scan already has
    # thousands of splits and Spark's AQE would keep this a no-op cost.
    return exploded.repartition(spark.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

_SUBSTR_K = 32

# k-token string windows, per-doc distinct (DuckDB list slicing is
# inclusive-end: w[i:i+k-1] is k tokens starting at i)
_SQL_WINDOWS = f"""
      list_distinct(CASE WHEN len(w) >= {_SUBSTR_K} THEN
        list_transform(range(1, len(w) - {_SUBSTR_K - 2}),
                       i -> array_to_string(w[i:i+{_SUBSTR_K - 1}], ' '))
      ELSE [] END)
"""


@register(
    "dedup_exact",
    oracle=f"""
    WITH {DOCS_CTE},
    hashed AS (SELECT doc_id, md5(text) AS text_hash FROM docs),
    exact AS (
      SELECT text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
      FROM hashed GROUP BY text_hash HAVING COUNT(*) > 1),
    win AS (
      SELECT doc_id, {_SQL_WINDOWS} AS wh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM docs)),
    expl AS (SELECT doc_id, unnest(wh) AS wnd FROM win),
    dup AS (SELECT wnd FROM expl GROUP BY wnd HAVING COUNT(*) > 1),
    cov AS (
      SELECT w.doc_id, len(w.wh) AS n_windows,
             COUNT(d.wnd) AS n_dup
      FROM win w
      LEFT JOIN (SELECT e.doc_id, e.wnd FROM expl e
                 JOIN dup USING (wnd)) d
        ON w.doc_id = d.doc_id
      GROUP BY w.doc_id, len(w.wh))
    SELECT 'exact' AS part, text_hash AS k1, n_copies AS n1,
           keeper_doc_id AS n2, CAST(NULL AS DOUBLE) AS v
    FROM exact
    UNION ALL
    SELECT 'substring' AS part, CAST(doc_id AS VARCHAR) AS k1,
           n_windows AS n1, n_dup AS n2,
           CASE WHEN n_windows > 0
                THEN CAST(n_dup AS DOUBLE) / n_windows END AS v
    FROM cov
    """,
    tags=("dedup", "llm-data", "substring"),
    doc="Exact dedup battery (tagged union): part 'exact' is the md5 "
        "content hash -> groupBy -> keep min doc_id; part 'substring' "
        "is Lee et al. 2022-style exact-substring coverage — the "
        f"fraction of each doc's {_SUBSTR_K}-token windows whose "
        "verbatim content appears in another document. The Spark side "
        "detects windows via O(n log k) doubling xxhash64 chains "
        "(8-byte longs end to end); the oracle rebuilds the same "
        "statistic from string windows — the outputs are counts and "
        "fractions, so they agree independently of the hash function.",
)
def dedup_exact(spark, sf_dir: str) -> DataFrame:
    docs = docs_with_dups(spark, sf_dir)
    exact = (docs.select("doc_id", F.md5("text").alias("text_hash"))
             .groupBy("text_hash")
             .agg(F.count(F.lit(1)).alias("n_copies"),
                  F.min("doc_id").alias("keeper_doc_id"))
             .filter(F.col("n_copies") > 1)
             .select(F.lit("exact").alias("part"),
                     F.col("text_hash").alias("k1"),
                     F.col("n_copies").alias("n1"),
                     F.col("keeper_doc_id").alias("n2"),
                     F.lit(None).cast("double").alias("v")))
    cov = (exact_substring_coverage(docs, k=_SUBSTR_K)
           .select(F.lit("substring").alias("part"),
                   F.col("doc_id").cast("string").alias("k1"),
                   F.col("n_windows").alias("n1"),
                   F.col("n_dup_windows").alias("n2"),
                   F.col("dup_frac").alias("v")))
    return exact.unionByName(cov)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(col):
    """Distinct 3-word shingles via higher-order functions (no explode)."""
    words = F.split(col, " ")
    n = F.size(words)
    return F.array_distinct(
        F.when(n >= 3, F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i + 1), F.element_at(words, i + 2),
                F.element_at(words, i + 3))))
        .otherwise(F.array()))


# One md5 per shingle; the k minhashes derive from that single 60-bit
# digest via universal hashing h_i(x) = (a_i*x + b_i) mod P — 12x fewer
# digest computations than k seeded md5 passes, same LSH guarantees.
# Each engine extracts the integer its fast way (Spark: native conv;
# DuckDB: strpos digit fold) — identical values, verified by the oracle.
_MH_PRIME = 4294967291       # largest 32-bit prime
_MH_MOD = 4294967296         # fold digests into [0, 2^32)


def _mh_params(i: int) -> tuple[int, int]:
    return 2 * i + 1, (i * 2654435761) % _MH_PRIME


def _hash_ints(shingle_col):
    """shingles -> 32-bit digest ints (ONE md5 per shingle)."""
    return F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("long") % _MH_MOD)


def _minhash_cols(xs_col, n_hashes: int = N_HASHES):
    """k universal-hash minima over the digest-int array.

    NB: the inner lambda must take exactly ONE parameter — a second
    parameter would make F.transform treat it as an (element, index)
    lambda and bind the array index over the multiplier."""
    def mh(i: int):
        a, b = _mh_params(i)
        return F.array_min(F.transform(
            xs_col, lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MH_PRIME)))

    return [mh(i).alias(f"mh{i}") for i in range(n_hashes)]


def _explode_bands(sigs: DataFrame, n_bands: int,
                   rows_per_band: int) -> DataFrame:
    """(doc_id, mh0..mhN) signature frame -> exploded (doc_id,
    band_idx, band_val) at the given geometry (band_val = the band's
    rows_per_band minima concatenated)."""
    return sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col(f"mh{b * rows_per_band + r}")
                               for r in range(rows_per_band)])
            for b in range(n_bands)
        ])).alias("band_idx", "band_val"))


def bands_from_hashed_shingles(hs: DataFrame, n_bands: int = N_BANDS,
                               rows_per_band: int = ROWS_PER_BAND
                               ) -> DataFrame:
    """(doc_id, shingles: array<bigint>) xxhash64'd shingle sets ->
    exploded (doc_id, band_idx, band_val) minhash-LSH band frame at an
    ARBITRARY geometry — the xxhash64-BASIS twin of
    :func:`_bands_from_shingles` (whose base ints are md5-derived and
    therefore only reconstructible from raw text). The maintained
    minhash verify tier stores exactly these hashed sets
    (dedup_index.minhash_verify_rows), so an index signed on this
    basis can be RE-SIGNED at any geometry from the tier alone —
    corpus text never read (dedup_index.rebuild_minhash_index_geometry,
    VERDICT r17 item 4). Same universal-hash family over the folded
    64-bit values (pmod into [0, 2^32) like :func:`_hash_ints`'s md5
    fold); the no-shingle filter mirrors _bands_from_shingles (short
    docs emit no band rows)."""
    xs = F.transform(F.col("shingles"),
                     lambda h: F.pmod(h, F.lit(_MH_MOD)))
    sigs = (hs.filter(F.size("shingles") > 0)
            .select("doc_id", xs.alias("xs"))
            .select("doc_id", *_minhash_cols(
                F.col("xs"), n_bands * rows_per_band)))
    return _explode_bands(sigs, n_bands, rows_per_band)


_SQL_SHINGLES = """
      list_distinct(CASE WHEN len(w) >= 3 THEN
        list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      ELSE [] END)
"""

_SQL_XS = (
    "list_transform({g}, s -> list_reduce(list_prepend(0::BIGINT, "
    "list_transform(range(1, 16), i -> CAST(strpos('0123456789abcdef', "
    "substr(md5(s), i, 1)) - 1 AS BIGINT))), (acc, d) -> acc * 16 + d) "
    f"% {_MH_MOD})")

_SQL_MINHASH = ", ".join(
    "list_min(list_transform(xs, x -> ({a} * x + {b}) % {p})) AS mh{i}"
    .format(a=_mh_params(i)[0], b=_mh_params(i)[1], p=_MH_PRIME, i=i)
    for i in range(N_HASHES))

_SQL_BANDS = ", ".join(
    " || '_' || ".join(f"mh{b * ROWS_PER_BAND + r}"
                       for r in range(ROWS_PER_BAND))
    + f" AS band{b}"
    for b in range(N_BANDS))

_SQL_BAND_MATCH = " OR ".join(
    f"a.band{b} = b.band{b}" for b in range(N_BANDS))


# Shared CTE chain: corpus -> shingles -> minhash signatures -> LSH bands
# -> candidate pairs -> exact-Jaccard-verified duplicate pairs. Reused by
# the pairwise query (dedup_minhash_lsh) and the cluster query
# (dedup_clusters), so both oracles see the identical pair set.
_SQL_MINHASH_CTES = f"""{DOCS_CTE},
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM toks),
    hx AS (SELECT doc_id, {_SQL_XS.format(g='shingles')} AS xs FROM sh),
    sigs AS (SELECT doc_id, {_SQL_MINHASH} FROM hx),
    banded AS (SELECT doc_id, {_SQL_BANDS} FROM sigs),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id
       AND ({_SQL_BAND_MATCH})),
    verified AS (
      SELECT doc_a, doc_b,
             len(list_filter(sa.shingles,
                             s -> list_contains(sb.shingles, s))) AS n_inter,
             len(sa.shingles) AS n_a, len(sb.shingles) AS n_b
      FROM pairs
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b),
    dup_pairs AS (
      SELECT doc_a, doc_b,
             CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
      FROM verified
      WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.6)
"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_MINHASH_CTES}
    SELECT doc_a, doc_b, jaccard FROM dup_pairs
    """,
    tags=("dedup", "llm-data", "minhash"),
    doc="MinHash(12)+LSH(3 bands x 4 rows): shingle -> signature -> "
        "band-bucket join on ids ONLY -> re-attach shingles -> "
        "exact-Jaccard verify >= 0.6.",
)
def dedup_minhash_lsh(spark, sf_dir: str) -> DataFrame:
    return _minhash_verified_pairs(docs_with_dups(spark, sf_dir))


def _minhash_band_frame(docs: DataFrame):
    """(shingle frame, exploded band frame) for a (doc_id, text)
    corpus — the shared feature build of the self-join, cross-frame,
    and incremental pair finders.

    Shingles are materialized ONCE (localCheckpoint): the signature
    branch and the verify re-attach branch both consume them, and
    without the checkpoint Catalyst re-derives the shingle arrays (the
    single most expensive narrow stage) for each branch — the classic
    "persist the feature DF" pattern. The band frame carries
    (doc_id, band_idx, band_val) ONLY, so the heavy shingle arrays
    never ride the candidate shuffle."""
    sh = (docs.select("doc_id", _shingles(F.col("text")).alias("shingles"))
          .localCheckpoint())
    return sh, _bands_from_shingles(sh)


def _bands_from_shingles(sh: DataFrame) -> DataFrame:
    """(doc_id, shingles) -> exploded (doc_id, band_idx, band_val) LSH
    band frame — the shared signature build of the self-join finders
    and the materialized index (operators/dedup_index.py).

    Docs with NO shingles (< 3 words) emit NO band rows: their
    minhash minima are all NULL and concat_ws folds NULLs to "" — so
    without the filter every short doc band-matched every other short
    doc (an O(shorts^2) candidate clique whose 0/0 Jaccard then threw
    DIVIDE_BY_ZERO under ANSI; found by the r15 hypothesis
    differential). The DuckDB oracle already behaves this way for
    free (its NULL band values never equi-join), so this is also a
    cross-engine parity fix on corpora with degenerate docs — the
    length gates own short docs, dedup never sees evidence for
    them."""
    sigs = (sh.filter(F.size("shingles") > 0)
            .select("doc_id", _hash_ints(F.col("shingles")).alias("xs"))
            .select("doc_id", *_minhash_cols(F.col("xs"))))
    return _explode_bands(sigs, N_BANDS, ROWS_PER_BAND)


def _verify_jaccard(pairs: DataFrame, sh_a: DataFrame, sh_b: DataFrame,
                    threshold: float = 0.6) -> DataFrame:
    """Attach shingles for the candidate ids only (semi-join first, so
    the arrays rebuild for the small candidate set, not the corpus)
    and keep pairs with true Jaccard >= threshold."""
    ids_a = pairs.select(F.col("doc_a").alias("doc_id")).distinct()
    ids_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    ca = sh_a.join(ids_a, "doc_id", "left_semi").alias("sa")
    cb = sh_b.join(ids_b, "doc_id", "left_semi").alias("sb")
    attached = (pairs
                .join(ca, F.col("sa.doc_id") == F.col("doc_a"))
                .join(cb, F.col("sb.doc_id") == F.col("doc_b"))
                .select("doc_a", "doc_b",
                        F.col("sa.shingles").alias("sh_a"),
                        F.col("sb.shingles").alias("sh_b")))
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = n_inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - n_inter)
    return (attached.select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def _minhash_verified_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) LSH candidates with true Jaccard >= 0.6."""
    sh, bands = _minhash_band_frame(docs)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"]))
    return _verify_jaccard(pairs, sh, sh)


def dedup_pairs_cross(new_docs: DataFrame,
                      seen_docs: DataFrame) -> DataFrame:
    """(doc_a=new id, doc_b=seen id, jaccard) verified near-dup pairs
    ACROSS two corpora — the incremental-dedup primitive: a new batch
    probes the historical corpus without re-pairing the historical
    corpus against itself (that N² half is exactly what an append-only
    pipeline must never redo). Same features, banding, and Jaccard
    verification as :func:`dedup_minhash_lsh`; id spaces need not be
    disjoint (no ordering constraint is applied across frames)."""
    sh_n, b_n = _minhash_band_frame(new_docs)
    sh_s, b_s = _minhash_band_frame(seen_docs)
    pairs = (b_n.alias("a")
             .join(b_s.alias("b"),
                   (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_val") == F.col("b.band_val")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    return _verify_jaccard(pairs, sh_n, sh_s)


def dedup_incremental_survivors(new_docs: DataFrame,
                                seen_docs: DataFrame) -> DataFrame:
    """The append-only dedup step (r12): from a NEW batch, drop every
    doc that near-dups the SEEN corpus (:func:`dedup_pairs_cross`),
    then resolve duplicates WITHIN the remainder (pairs -> connected
    components -> :func:`dedup_survivors`). Returns surviving new rows
    unchanged — union them into the corpus and the invariant "no two
    near-dup docs in the corpus" is maintained batch over batch
    (assuming it held for ``seen_docs``). Cost per batch is
    ~O(batch x bands) + the band join against the seen index — never
    a re-pairing of the historical corpus."""
    hit = (dedup_pairs_cross(new_docs, seen_docs)
           .select(F.col("doc_a").alias("doc_id")).distinct())
    fresh = new_docs.join(hit, "doc_id", "left_anti")
    return dedup_survivors(
        fresh, connected_components(_minhash_verified_pairs(fresh)))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIM_BITS = 32

# portable hex->int: fold 8 hex chars of md5(word)
_SPARK_H32 = ("aggregate(transform(sequence(1, 8), i -> "
              "cast(instr('0123456789abcdef', substring(md5(wrd), i, 1)) - 1 "
              "as long)), cast(0 as long), (acc, d) -> acc * 16 + d)")
_SQL_H32 = ("list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 9),"
            " i -> CAST(strpos('0123456789abcdef', substr(md5(wrd), i, 1))"
            " - 1 AS BIGINT))), (acc, d) -> acc * 16 + d)")


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {DOCS_CTE},
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wrd FROM docs),
    wh AS (SELECT doc_id, {_SQL_H32} AS h FROM toks),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (h // (1::BIGINT << j)) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM wh, (SELECT unnest(range(0, {_SIM_BITS})) AS j)
      GROUP BY doc_id, j),
    sims AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sims a JOIN sims b
      ON a.simhash // {1 << 16} = b.simhash // {1 << 16}
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "llm-data", "simhash"),
    doc="SimHash(32-bit, word features) with 16-bit prefix blocking; "
        "near-dup iff hamming distance <= 3.",
)
def dedup_simhash(spark, sf_dir: str) -> DataFrame:
    docs = docs_with_dups(spark, sf_dir)
    # explode_outer + isNotNull: the inferred size(split)>0 filter of a
    # plain explode re-evaluates the split per row (r13 generate lesson)
    words = (docs.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("wrd"))
        .filter(F.col("wrd").isNotNull()))
    wh = words.select("doc_id", F.expr(_SPARK_H32).alias("h"))
    # 32 conditional partial aggregates instead of a words x bits explode
    # (identical integer math; map-side combine keeps the shuffle at one
    # row per doc).
    per_doc = wh.groupBy("doc_id").agg(*[
        F.sum(F.when(F.getbit(F.col("h"), F.lit(j)) == 1, 1).otherwise(-1))
        .alias(f"s{j}") for j in range(_SIM_BITS)])
    simhash_expr = None
    for j in range(_SIM_BITS):
        term = F.when(F.col(f"s{j}") > 0,
                      F.lit(1 << j).cast("long")).otherwise(F.lit(0))
        simhash_expr = term if simhash_expr is None else simhash_expr + term
    sims = per_doc.select("doc_id", simhash_expr.alias("simhash"))
    a, b = sims.alias("a"), sims.alias("b")
    prefix = 1 << 16
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, ((F.col("a.simhash") / prefix).cast("long")
                       == (F.col("b.simhash") / prefix).cast("long"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    hamming.alias("hamming"))
            .filter(F.col("hamming") <= 3))


# ---------------------------------------------------------------------------
# n-gram Jaccard (word bigrams, MinHash-LSH candidate blocking)
# ---------------------------------------------------------------------------

# 6 bands x 2 rows over 12 minhashes: band threshold (1/6)^(1/2) ~ 0.41,
# matched to the 0.5 Jaccard verify. Blocking by band keys is BOUNDED —
# the former (lang, length-bucket) blocks grow with corpus size and go
# quadratic at scale; a band bucket only collects genuinely-similar docs.
_JAC_BANDS = 6
_JAC_ROWS = 2

_SQL_JAC_BANDS = ", ".join(
    " || '_' || ".join(f"mh{b * _JAC_ROWS + r}" for r in range(_JAC_ROWS))
    + f" AS band{b}"
    for b in range(_JAC_BANDS))

_SQL_JAC_BAND_MATCH = " OR ".join(
    f"a.band{b} = b.band{b}" for b in range(_JAC_BANDS))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {DOCS_CTE},
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' '
                    || string_split(text, ' ')[i+1])) AS g
      FROM docs),
    hx AS (SELECT doc_id, {_SQL_XS.format(g='g')} AS xs FROM grams),
    sigs AS (SELECT doc_id, {_SQL_MINHASH} FROM hx),
    banded AS (SELECT doc_id, {_SQL_JAC_BANDS} FROM sigs),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b ON a.doc_id < b.doc_id
       AND ({_SQL_JAC_BAND_MATCH})),
    verified AS (
      SELECT doc_a, doc_b,
             len(list_filter(ga.g, x -> list_contains(gb.g, x))) AS n_inter,
             len(ga.g) AS n_a, len(gb.g) AS n_b
      FROM pairs
      JOIN grams ga ON ga.doc_id = doc_a
      JOIN grams gb ON gb.doc_id = doc_b)
    SELECT doc_a, doc_b,
           CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
    FROM verified
    WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.5
    """,
    tags=("dedup", "llm-data", "jaccard"),
    doc="Word-bigram Jaccard >= 0.5 with MinHash-LSH candidate blocking "
        "(6 bands x 2 rows, threshold ~0.41): bounded band buckets "
        "replace the unbounded (lang, length-bucket) blocks; ids-only "
        "band join, gram arrays re-attached for the verify.",
)
def dedup_ngram_jaccard(spark, sf_dir: str) -> DataFrame:
    docs = docs_with_dups(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    # the n>=2 guard mirrors _shingles' n>=3 (r15): without it a
    # 1-word doc's sequence(0, -1) DESCENDS and element_at walks out
    # of bounds — an ANSI crash on degenerate input the fixture never
    # carries (the DuckDB oracle's range(1, 1) is simply empty)
    bigrams = F.array_distinct(
        F.when(F.size(words) >= 2, F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1),
                                  F.element_at(words, i + 2))))
        .otherwise(F.array()))
    # Same one-computation pattern as minhash: both the signature branch
    # and the verify branch read the gram arrays.
    grams = (docs.select("doc_id", bigrams.alias("g"))
             .localCheckpoint())
    # empty gram sets emit no signature — same reason as
    # _bands_from_shingles' filter (all-NULL minhashes band-match
    # every other empty doc, then the Jaccard verify divides 0/0)
    sigs = (grams.filter(F.size("g") > 0)
            .select("doc_id", _hash_ints(F.col("g")).alias("xs"))
            .select("doc_id", *_minhash_cols(F.col("xs"))))
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.concat_ws("_", *[F.col(f"mh{b * _JAC_ROWS + r}")
                               for r in range(_JAC_ROWS)])
            for b in range(_JAC_BANDS)
        ])).alias("band_idx", "band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"]))
    cand_ids = (pairs.select(F.col("doc_a").alias("doc_id"))
                .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
                .distinct())
    cand_grams = grams.join(cand_ids, "doc_id", "left_semi")
    ga, gb = cand_grams.alias("ga"), cand_grams.alias("gb")
    attached = (pairs
                .join(ga, F.col("ga.doc_id") == F.col("doc_a"))
                .join(gb, F.col("gb.doc_id") == F.col("doc_b"))
                .select("doc_a", "doc_b", F.col("ga.g").alias("g_a"),
                        F.col("gb.g").alias("g_b")))
    n_inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    jac = n_inter.cast("double") / (
        F.size("g_a") + F.size("g_b") - n_inter)
    return (attached.select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.5))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (hyperplane-LSH-blocked, top-20 by similarity)
# ---------------------------------------------------------------------------

_SPARK_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
              "cast(y as double)), cast(0 as double), (acc, v) -> acc + v)")
_SQL_DOT = ("list_reduce(list_prepend(0.0::DOUBLE, list_transform("
            "list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)), "
            "(acc, v) -> acc + v)")

# Deterministic random hyperplanes (shared with operators/similarity.py):
# weight(plane p, dim d) = +1 if the md5-derived hex nibble is even else
# -1; bucket = n sign bits. Identical arithmetic on both engines. The
# md5 family extends to ANY plane count without changing the algorithm,
# which is the 100 TB lever: within-bucket candidate pairs grow
# ~quadratically in corpus/2^n_planes, so n_planes must track the
# corpus (see scaled_n_planes). The 8-bit forms below stay pinned — the
# catalog oracles are written against them.
_N_PLANES = 8


def spark_sign_expr(n_planes: int, plane_offset: int = 0) -> str:
    """Spark SQL for the n-bit hyperplane signature of `embedding`.
    ``plane_offset`` selects planes [offset, offset+n) from the same
    deterministic md5 family — the banded forms' independent-band
    lever (mirrors ``plane_weights``/``sign_bucket_col``)."""
    return (
        "aggregate(sequence({off}, {off} + {np} - 1), cast(0 as long), "
        "(acc, p) -> "
        "acc * 2 + if(aggregate(zip_with(embedding, "
        "sequence(0, size(embedding) - 1), (x, d) -> cast(x as double) * "
        "if(instr('02468ace', substring(md5(concat(cast(p as string), '_', "
        "cast(d as string))), 1, 1)) > 0, 1.0d, -1.0d)), cast(0 as double), "
        "(acc2, v) -> acc2 + v) > 0d, 1L, 0L))"
    ).format(np=n_planes, off=plane_offset)


def sql_sign_expr(n_planes: int, plane_offset: int = 0) -> str:
    """DuckDB equivalent of :func:`spark_sign_expr` (oracles/tests).
    ``plane_offset`` selects planes [offset, offset+n) from the same
    md5 family — the oracle-side twin of the banded forms' per-band
    independent planes."""
    return (
        "list_reduce(list_prepend(0::BIGINT, list_transform("
        "range({off}, {off} + {np}), "
        "p -> CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(list_zip(embedding, range(0, len(embedding))), "
        "z -> z[1]::DOUBLE * (CASE WHEN strpos('02468ace', "
        "substr(md5(p::VARCHAR || '_' || z[2]::VARCHAR), 1, 1)) > 0 "
        "THEN 1.0 ELSE -1.0 END))), (acc2, v) -> acc2 + v) > 0 "
        "THEN 1::BIGINT ELSE 0::BIGINT END)), (acc, b) -> acc * 2 + b)"
    ).format(np=n_planes, off=plane_offset)


def scaled_n_planes(corpus_rows: int, target_bucket_size: int = 64,
                    floor: int = _N_PLANES) -> int:
    """Corpus-tracking plane count: n ≈ log2(corpus) − log2(bucket),
    so the expected bucket population stays ~target_bucket_size and
    within-bucket pairwise work stays ~corpus × target instead of
    ~corpus²/2^8 (e.g. ~20 bits for 1e9 vectors at ~1k/bucket)."""
    import math
    return max(floor, math.ceil(math.log2(
        max(corpus_rows, 1) / max(target_bucket_size, 1))))


def minhash_rows_for_threshold(j_threshold: float,
                               n_bands: int = N_BANDS,
                               floor: int = 1, cap: int = 64) -> int:
    """rows_per_band whose banded-minhash S-curve midpoint sits at
    ``j_threshold`` for ``n_bands`` — the standard LSH threshold
    identity J* ~ (1/b)^(1/r), inverted: r = ln(1/b)/ln(J*). The
    sizing rule for :func:`~.dedup_index.rebuild_minhash_index_geometry`
    (the embedding side's :func:`scaled_n_planes` twin): a grown
    corpus that admits too many false candidates wants the midpoint
    pushed UP toward its verify threshold (larger r = steeper curve,
    fewer sub-threshold candidates per band); the creation-time
    default (r=4, b=3) sits at (1/3)^(1/4) ~ 0.76."""
    import math
    if not 0.0 < j_threshold < 1.0:
        raise ValueError(
            f"j_threshold must be in (0, 1), got {j_threshold}")
    if n_bands < 1:
        raise ValueError(f"n_bands must be >= 1, got {n_bands}")
    if n_bands == 1:
        # single band: no banded OR to place a midpoint with — r only
        # steepens P = J^r; pick r so P(J*) = 0.5
        r = math.log(0.5) / math.log(j_threshold)
    else:
        r = math.log(1.0 / n_bands) / math.log(j_threshold)
    return max(floor, min(cap, round(r)))


_SPARK_SIGN = spark_sign_expr(_N_PLANES)
_SQL_SIGN = sql_sign_expr(_N_PLANES)


def plane_weights(n_planes: int, dim: int,
                  plane_offset: int = 0) -> list[list[float]]:
    """The ±1 hyperplane weight matrix, materialized ONCE driver-side.
    Same rule as the SQL forms: weight(p, d) = +1 iff the first hex
    nibble of md5("{p}_{d}") is even — hashlib.md5 and Spark/DuckDB md5
    agree by definition. ``plane_offset`` selects planes
    [offset, offset+n) from the same infinite deterministic family —
    how the banded form gives every band its own independent planes."""
    import hashlib
    return [[1.0 if hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0]
             in "02468ace" else -1.0 for d in range(dim)]
            for p in range(plane_offset, plane_offset + n_planes)]


def sign_bucket_col(n_planes: int, dim: int, plane_offset: int = 0):
    """The n-bit hyperplane signature as a literal-weight Column.

    Numerically IDENTICAL to ``spark_sign_expr`` (same left-fold of
    double(x_d) * (±1.0) per plane, same >0 sign, same bit fold) but
    ~n_planes×dim md5-of-string evaluations per ROW cheaper: the
    md5-derived weights depend only on (plane, dim), so they fold into
    literal arrays at plan build instead of being recomputed inside the
    per-row expression — the signature stage drops from hash-bound to
    a handful of fused double multiply-adds. Requires a uniform
    embedding dimension (the expression form handles ragged rows).

    Emitted as ONE parsed SQL string (r18, guide §7.3): the
    nested-Column form paid ~n_planes x dim py4j round-trips per
    invocation (signature builders run in six dedup/ann catalog
    queries and in the maintenance loops per trigger). Same nested
    fold, same IEEE order — buckets bitwise identical (oracle-pinned
    via every bucket-blocked query)."""
    bucket = "CAST(0 AS BIGINT)"
    for w in plane_weights(n_planes, dim, plane_offset):
        wlit = "array(" + ", ".join(
            ("1.0D" if x > 0 else "-1.0D") for x in w) + ")"
        dot = (f"aggregate(zip_with(embedding, {wlit}, "
               "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, "
               "(acc, v) -> acc + v)")
        bucket = (f"({bucket} * 2 + CAST(CASE WHEN {dot} > 0.0D "
                  "THEN 1 ELSE 0 END AS BIGINT))")
    return F.expr(bucket)


# width-census memo, keyed by (analyzed-plan semanticHash, input-file
# digest): the census is corpus METADATA, and every signature-building
# query in a bench/battery session re-derives the same frame — one
# narrow aggregate scan per distinct corpus per session instead of one
# per invocation. The file digest is the DATA-VERSION half of the key
# (VERDICT r12 item 1): a path re-read after the directory gained files
# (the append-only lake shape) produces the SAME plan hash but a
# different file list, so it misses the memo and re-probes — without
# it, a corpus that turned ragged after its first census would silently
# get the bare literal signature form, whose zip_with NULL-padding
# folds other-width rows to the all-zero signature. A DataFrame whose
# own file index predates the append keeps its (still-correct) entry:
# its scan is pinned to the files it listed. Non-file frames (local
# relations, in-memory) digest to the empty string — they cannot gain
# rows, so the plan hash alone identifies them. Files are identified
# by path (parquet files are immutable by convention; in-place file
# rewrites are outside the contract). The memo is size-bounded
# (oldest-out) so long sessions over many corpora don't grow it
# unboundedly.
_WIDTH_CENSUS: dict[tuple, dict[int, int]] = {}
_WIDTH_CENSUS_MAX = 64


def _census_key(emb: DataFrame) -> tuple:
    import hashlib
    files = emb.inputFiles()
    digest = (hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()
              if files else "")
    return (emb._jdf.queryExecution().analyzed().semanticHash(),
            len(files), digest)


def embedding_width_census(emb: DataFrame) -> dict[int, int]:
    """width -> row count for the embedding column (NULL embeddings
    count under -1) — one narrow aggregate scan, memoized per corpus
    data version (see ``_WIDTH_CENSUS``)."""
    key = _census_key(emb)
    got = _WIDTH_CENSUS.get(key)
    if got is None:
        got = {int(r.w): int(r.n) for r in
               emb.groupBy(F.coalesce(F.size("embedding"), F.lit(-1))
                           .alias("w"))
               .agg(F.count(F.lit(1)).alias("n")).collect()}
        while len(_WIDTH_CENSUS) >= _WIDTH_CENSUS_MAX:
            _WIDTH_CENSUS.pop(next(iter(_WIDTH_CENSUS)))
        _WIDTH_CENSUS[key] = got
    return got


def bucket_col_for(emb: DataFrame, n_planes: int,
                   width: int | None = None,
                   plane_offset: int = 0):
    """Best signature form for this corpus, decided at CORPUS level
    (VERDICT r11 item 1 — the width decision used to be a per-row
    ``when(size==probed_dim, literal).otherwise(md5-expr)`` guard,
    which put the ~n_planes x dims md5 expression tree in every plan
    and cost the whole LSH-bucket family ~1.2-1.35x even on uniform
    corpora where the fallback branch never fired):

    - ``width`` given (a deployment that KNOWS its model's embedding
      width — the 100 TB path, zero probe scans): bare literal column.
    - uniform corpus (width census finds one width, no NULLs): bare
      literal column — no branch, no md5 expr anywhere in the plan.
    - genuinely ragged / NULL-bearing corpus: the per-row guard, with
      the literal fast path on the DOMINANT width and the
      width-independent md5 expression on the rest — bit-identical to
      the pure expression form for every row
      (tests/test_similarity_topk.py
      test_ragged_embedding_bucket_parity). An unconditional literal
      form here would zip_with-pad NULLs on every other-width row,
      fold the dot to NULL, and silently emit an all-zero signature.
    - empty corpus: the expression form.

    The census is one narrow aggregate scan, memoized per corpus per
    session (``embedding_width_census``). ``plane_offset`` selects the
    plane family window (banded layouts) — every form below threads
    it, so offset-banded signatures keep the ragged-corpus guard."""
    if width is not None:
        return sign_bucket_col(n_planes, width, plane_offset)
    census = embedding_width_census(emb)
    widths = [w for w in census if w >= 0]
    expr_form = F.expr(spark_sign_expr(n_planes, plane_offset))
    if not widths:
        return expr_form
    if len(census) == 1:  # one width, zero NULLs: the uniform fast path
        return sign_bucket_col(n_planes, widths[0], plane_offset)
    dom = max(widths, key=lambda w: (census[w], w))
    return F.when(F.size("embedding") == dom,
                  sign_bucket_col(n_planes, dom, plane_offset)
                  ).otherwise(expr_form)


def dedup_embedding_cosine(spark, sf_dir: str) -> DataFrame:
    return _embedding_cosine_pairs(spark, sf_dir, _N_PLANES)


def _indexed_cross_probe(spark, sf_dir: str,
                         tau: float = 0.3,
                         with_pushdown: bool = False) -> DataFrame:
    """Cross-probe verified pairs THROUGH a committed
    :class:`~.dedup_index.DedupIndexStore` (VERDICT r16 item 5: the
    maintained-index subsystem under the DuckDB oracle). The even
    vec_ids play the seen corpus: their (band_idx, bucket, nrm) rows
    are appended to a real on-disk embedding index (manifest create ->
    atomic append publish -> re-open -> load), and the odd half probes
    it with the standard 2x8-bit multi-band geometry + cosine verify
    (candidate-pushdown OFF on the base part — see the inline note at
    the embedding_pairs_cross_indexed call; ``with_pushdown`` adds a
    second, pushdown-ON probe of the SAME committed index as an extra
    ``part`` — r18, the oracle row for the isin/range-residual
    machinery). The oracle recomputes the same pairs from
    the raw table — the md5 hyperplane family is shared SQL, so the
    banding itself (not just the verified answer) is cross-checked.
    The result is localCheckpointed (bounded: the verified pair set)
    so the scratch index directory can be deleted before return."""
    import os
    import shutil
    import tempfile

    from .dedup_index import (_trigger_shuffle_width,
                              create_embedding_index,
                              embedding_index_rows,
                              embedding_pairs_cross_indexed,
                              open_dedup_index)

    emb = load_spread(spark, sf_dir, "embeddings")
    seen = emb.filter(F.col("vec_id") % 2 == 0) \
        .select("vec_id", "embedding")
    new = emb.filter(F.col("vec_id") % 2 == 1) \
        .select("vec_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="ses_idx_probe_")
    try:
        # trigger-sized frames want trigger-sized shuffle width (the
        # r14 maintenance lesson): the append/probe/checkpoint stages
        # all run eagerly inside this block
        with _trigger_shuffle_width(spark, 8):
            idir = os.path.join(tmp, "idx")
            store = create_embedding_index(idir, n_planes=_N_PLANES,
                                           n_bands=2)
            # coalesce before the append: load_spread fans the tiny
            # seen half across the full core count for scan
            # parallelism, but 32 near-empty index files would pay
            # 32 task launches here and again at probe read-back
            store.append(embedding_index_rows(seen, 2, _N_PLANES)
                         .coalesce(4))
            store = open_dedup_index(idir)      # manifest round-trip
            # candidate_pushdown stays OFF here: at catalog scale its
            # two extra driver jobs (pairs checkpoint + id collect)
            # dominate the fixture-sized probe, and the pushdown
            # machinery is pinned by its own hypothesis differential
            # (three-mode _restrict_to_candidates) + the maintenance
            # loop tests — this slot oracles the STATE path
            # (manifest append -> load -> banded probe -> verify)
            pairs = embedding_pairs_cross_indexed(
                new, seen, store.load(spark), n_bands=2,
                band_bits=_N_PLANES, tau=tau)
            out = pairs.select(
                F.lit("index_probe").alias("part"),
                "doc_a", "doc_b", "cosine")
            if with_pushdown:
                # VERDICT r17 item 8: the SAME probe with the
                # candidate-pushdown machinery ON (isin into the seen
                # verify attach when the candidate ids fit the limit;
                # between/range-residual above it) — identical pairs
                # by construction, so the oracle SQL for this part is
                # the probe CTE re-labeled, and a hash mismatch here
                # means the pushdown path corrupted the verify
                # attach. Reuses the index committed above: one
                # append, two probes. sf-gated by the caller (small
                # fixtures only — at bench scale the two extra driver
                # jobs would dominate the fixture-sized probe).
                pd_pairs = embedding_pairs_cross_indexed(
                    new, seen, store.load(spark), n_bands=2,
                    band_bits=_N_PLANES, tau=tau,
                    candidate_pushdown=4096)
                out = out.unionByName(pd_pairs.select(
                    F.lit("index_probe_pushdown").alias("part"),
                    "doc_a", "doc_b", "cosine"))
            return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id, embedding,
             sqrt({_SQL_DOT.format(a='embedding', b='embedding')}) AS nrm,
             {_SQL_SIGN} AS b0,
             {sql_sign_expr(_N_PLANES, _N_PLANES)} AS b1
      FROM embeddings),
    top20 AS (
      SELECT doc_a, doc_b, cosine FROM (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
                 / (a.nrm * b.nrm) AS cosine
        FROM norms a JOIN norms b
          ON a.b0 = b.b0 AND a.vec_id < b.vec_id) t
      ORDER BY cosine DESC, doc_a, doc_b LIMIT 20),
    probe AS (
      SELECT doc_a, doc_b, cosine FROM (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
                 / (a.nrm * b.nrm) AS cosine
        FROM norms a JOIN norms b
          ON (a.b0 = b.b0 OR a.b1 = b.b1)
         AND a.vec_id % 2 = 1 AND b.vec_id % 2 = 0) t
      WHERE cosine >= 0.3)
    SELECT 'bucket_top20' AS part, doc_a, doc_b, cosine FROM top20
    UNION ALL
    SELECT 'index_probe' AS part, doc_a, doc_b, cosine FROM probe
    UNION ALL
    SELECT 'index_probe_pushdown' AS part, doc_a, doc_b, cosine
    FROM probe
    WHERE (SELECT count(*) FROM embeddings) <= 500
    ORDER BY part, doc_a, doc_b
    """,
    tags=("dedup", "llm-data", "embedding", "index"),
    doc="Two-part embedding near-dup battery. part=bucket_top20: 8-bit "
        "hyperplane-LSH bucket join (the same buckets as ann_lsh_topk) "
        "-> pairwise cosine within bucket, top-20. part=index_probe "
        "(r17): the even half committed to a REAL on-disk embedding "
        "DedupIndexStore (manifest append), the odd half cross-probed "
        "through the 2x8-bit banded index rows with cosine verify — "
        "the maintained-index probe path under the DuckDB oracle, "
        "whose SQL recomputes the banding from the shared md5 plane "
        "family. part=index_probe_pushdown (r18, small fixtures only "
        "— both engines gate on corpus rows <= 500): the SAME probe "
        "with candidate_pushdown ON, putting the isin/range-residual "
        "verify-attach machinery under the hash check (identical "
        "pairs by construction). Ordered-fold dot products are "
        "bitwise cross-engine deterministic.",
)
def dedup_embedding_cosine_battery(spark, sf_dir: str) -> DataFrame:
    top = dedup_embedding_cosine(spark, sf_dir).select(
        F.lit("bucket_top20").alias("part"), "doc_a", "doc_b", "cosine")
    # the pushdown part runs on small fixtures only (oracle gates on
    # the same count): at bench scale its two extra driver jobs would
    # dominate the fixture-sized probe this battery prices
    small = load_spread(spark, sf_dir, "embeddings").count() <= 500
    probe = _indexed_cross_probe(spark, sf_dir, with_pushdown=small)
    return top.unionByName(probe).orderBy("part", "doc_a", "doc_b")


def _embedding_cosine_pairs(spark, sf_dir: str, n_planes: int,
                            limit: int = 20) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id", "embedding",
        F.sqrt(F.expr(_SPARK_DOT.format(a="embedding", b="embedding")))
        .alias("nrm"),
        bucket_col_for(emb, n_planes).alias("bucket"))
    a, b = norms.alias("a"), norms.alias("b")
    dot = F.expr(_SPARK_DOT.format(a="a.embedding", b="b.embedding"))
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("doc_a"),
                    F.col("b.vec_id").alias("doc_b"),
                    F.try_divide(dot, F.col("a.nrm") * F.col("b.nrm"))
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(limit))


def dedup_embedding_cosine_scaled(spark, sf_dir: str,
                                  n_planes: int | None = None,
                                  target_bucket_size: int = 64,
                                  limit: int = 20) -> DataFrame:
    """The 100 TB form of ``dedup_embedding_cosine``: identical
    algorithm, but the hyperplane count tracks the corpus
    (:func:`scaled_n_planes`) so expected bucket population — and with
    it the quadratic within-bucket pair term — stays bounded as the
    corpus grows. At n_planes=8 this IS the catalog query (plans are
    byte-identical); the catalog entry stays 8-bit because its DuckDB
    oracle is written against that bucket definition.

    More planes tighten the similarity bound each shared bucket
    implies (every extra matching sign bit is one more agreeing
    hyperplane), trading recall for candidate count exactly like every
    hyperplane-LSH deployment; when a use case needs recall at high
    plane counts, :func:`dedup_embedding_cosine_banded` is that form
    (independent plane bands, any-band match)."""
    if n_planes is None:
        n_planes = scaled_n_planes(
            sum(embedding_width_census(
                load_spread(spark, sf_dir, "embeddings")).values()),
            target_bucket_size)
    return _embedding_cosine_pairs(spark, sf_dir, n_planes, limit)


def dedup_embedding_cosine_banded(spark, sf_dir: str, n_bands: int = 2,
                                  band_bits: int | None = None,
                                  target_bucket_size: int = 64,
                                  limit: int = 20) -> DataFrame:
    """The recall-restoring form of ``dedup_embedding_cosine_scaled``
    at high plane counts — the banding its docstring promises, built
    exactly like :func:`dedup_minhash_lsh`'s band structure but over
    hyperplane sign bits: ONE (n_bands x band_bits)-bit signature per
    vector, split into ``n_bands`` disjoint ``band_bits``-bit bands; a
    pair is a candidate when ANY band matches (ids-only band join ->
    distinct -> re-attach embeddings -> exact cosine).

    Recall/cost algebra (the same S-curve as MinHash banding): with
    per-plane agreement p = 1 - theta/pi, a single w-bit bucket keeps a
    near-dup pair with p^w — vanishing as w tracks the corpus — while
    n bands of w bits keep it with 1-(1-p^w)^n. ``band_bits`` defaults
    to scaled_n_planes(corpus, target_bucket_size) so each band's
    expected bucket population stays ~target_bucket_size: candidate
    work is ~n_bands x corpus x target, never quadratic. Each band's
    signature is its OWN band_bits-bit column over its own plane range
    (plane_offset = band x band_bits from the same deterministic md5
    family) — no shared 64-bit word, so n_bands x band_bits has no
    ceiling. At ``n_bands=1`` band 0's planes are exactly planes
    0..band_bits-1, so the pair set (and top-k) is IDENTICAL to the
    single-bucket form — pinned in tests/test_similarity_topk.py.

    Requires a uniform-width, non-NULL embedding corpus (checked via
    the width census) — the deployment norm; the ragged fallback only
    exists on the un-banded oracle-pinned forms."""
    emb = load_spread(spark, sf_dir, "embeddings")
    return banded_cosine_pairs(emb, n_bands, band_bits,
                               target_bucket_size, limit)


def embedding_pairs_cross(new_emb: DataFrame, seen_emb: DataFrame,
                          n_planes: int | None = None,
                          target_bucket_size: int = 64,
                          tau: float = 0.9,
                          width: int | None = None) -> DataFrame:
    """(doc_a=new vec_id, doc_b=seen vec_id, cosine) verified
    near-dup pairs ACROSS two embedding corpora — the vector analog of
    :func:`dedup_pairs_cross` for append-only pipelines: a new batch's
    hyperplane signatures probe the seen corpus's buckets (same
    deterministic plane family on both sides — signatures computed
    independently are join-compatible by construction), exact cosine
    verifies candidates at >= tau. The seen corpus is never re-paired
    against itself. ``n_planes`` defaults to corpus-tracking on the
    SEEN side (the big one), via the memoized width census' value-sum
    — no separate ``count()`` action (ADVICE r12); ``width`` skips
    the per-side census probes inside ``bucket_col_for`` (pass an
    explicit ``n_planes`` with it for a zero-probe call)."""
    if n_planes is None:
        n_planes = scaled_n_planes(
            sum(embedding_width_census(seen_emb).values()),
            target_bucket_size)

    def norms(df):
        return df.select(
            "vec_id", "embedding",
            F.sqrt(F.expr(_SPARK_DOT.format(a="embedding", b="embedding")))
            .alias("nrm"),
            bucket_col_for(df, n_planes, width=width).alias("bucket"))

    a = norms(new_emb).alias("a")
    b = norms(seen_emb).alias("b")
    dot = F.expr(_SPARK_DOT.format(a="a.embedding", b="b.embedding"))
    # try_divide EVERYWHERE a cosine divides (r15, all embedding
    # paths): a zero vector has no direction, so its cosine is
    # undefined — NULL, which every >= tau filter and DESC top-k
    # ordering discards. Plain division THROWS under ANSI when two
    # zero vectors share a bucket (they always do: sign(0-dot) is a
    # constant signature), and DuckDB's `/` returns NULL on a zero
    # divisor, so try_divide is also the exact oracle-parity twin.
    return (a.join(b, F.col("a.bucket") == F.col("b.bucket"))
            .select(F.col("a.vec_id").alias("doc_a"),
                    F.col("b.vec_id").alias("doc_b"),
                    F.try_divide(dot, F.col("a.nrm") * F.col("b.nrm"))
                    .alias("cosine"))
            .filter(F.col("cosine") >= tau))


def banded_signature_rows(emb: DataFrame, n_bands: int, band_bits: int,
                          width: int | None = None,
                          id_col: str = "vec_id") -> DataFrame:
    """(id, band_idx, bucket) — one row per (vector, band), band b
    signed under planes [b*band_bits, (b+1)*band_bits) of the shared
    deterministic md5 family (the layout of
    :func:`banded_cosine_pairs`, exported so the materialized
    embedding index can persist the SAME rows). Band 0 at any
    ``band_bits`` equals the single-bucket signature at that plane
    count. Signatures computed independently on two corpora are
    join-compatible on (band_idx, bucket) by construction."""
    sigs = emb.select(
        id_col,
        *[bucket_col_for(emb, band_bits, width=width,
                         plane_offset=b * band_bits).alias(f"_band{b}")
          for b in range(n_bands)])
    return (sigs.select(id_col, F.explode(F.array(*[
        F.struct(F.lit(b).cast("int").alias("band_idx"),
                 F.col(f"_band{b}").alias("bucket"))
        for b in range(n_bands)])).alias("bd"))
        .select(id_col, "bd.band_idx", "bd.bucket"))


def embedding_pairs_cross_banded(new_emb: DataFrame,
                                 seen_emb: DataFrame,
                                 n_bands: int, band_bits: int,
                                 tau: float = 0.9,
                                 width: int | None = None) -> DataFrame:
    """Multi-band form of :func:`embedding_pairs_cross` (ADVICE r13):
    a pair is a candidate when ANY of ``n_bands`` independent
    ``band_bits``-bit hyperplane bands matches — the recall-restoring
    S-curve (keep prob 1-(1-p^bits)^bands instead of the vanishing
    p^(bands*bits) a single corpus-scale-width band leaves). This is
    the recompute differential twin of the materialized embedding
    index's banded probe.

    Scale: ids-only through the (band_idx, bucket) equi-join — the
    embedding arrays never enter the exploded band frame; candidates
    dropDuplicate before ONE cosine verify per pair."""
    bands_a = banded_signature_rows(new_emb, n_bands, band_bits,
                                    width=width)
    bands_b = banded_signature_rows(seen_emb, n_bands, band_bits,
                                    width=width)
    pairs = (bands_a.alias("a")
             .join(bands_b.alias("b"),
                   (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.bucket") == F.col("b.bucket")))
             .select(F.col("a.vec_id").alias("doc_a"),
                     F.col("b.vec_id").alias("doc_b"))
             .dropDuplicates(["doc_a", "doc_b"]))

    def norms(df, side):
        return df.select(
            F.col("vec_id").alias(f"doc_{side}"),
            F.col("embedding").alias(f"emb_{side}"),
            F.sqrt(F.expr(_SPARK_DOT.format(a="embedding",
                                            b="embedding")))
            .alias(f"nrm_{side}"))

    dot = F.expr(_SPARK_DOT.format(a="emb_a", b="emb_b"))
    return (pairs.join(norms(new_emb, "a"), "doc_a")
            .join(norms(seen_emb, "b"), "doc_b")
            .select("doc_a", "doc_b",
                    F.try_divide(dot, F.col("nrm_a") * F.col("nrm_b"))
                    .alias("cosine"))
            .filter(F.col("cosine") >= tau))


def embedding_incremental_survivors(new_emb: DataFrame,
                                    seen_emb: DataFrame,
                                    n_planes: int | None = None,
                                    target_bucket_size: int = 64,
                                    tau: float = 0.9,
                                    width: int | None = None,
                                    within_bands: int = 4
                                    ) -> DataFrame:
    """Append-only EMBEDDING dedup (the vector analog of
    :func:`dedup_incremental_survivors`): drop new vectors within
    cosine >= tau of the seen corpus, then resolve near-dups within
    the remaining batch (banded bucket pairs -> connected components
    -> min-label survivors). Returns surviving new rows unchanged.

    The within-batch pass (ADVICE r12) runs MULTI-BAND with
    ``band_bits`` scaled to the BATCH, not the seen corpus: the
    cross probe's ``n_planes`` tracks the seen side (~20+ bits at
    scale), and a single band at that width keeps a cosine-0.9
    within-batch pair with ~p^24 ≈ 2% — the banded form exists
    precisely to restore recall there (``within_bands`` bands of
    batch-sized bits keep it with 1-(1-p^bits)^bands). The pair set
    is consumed UNSORTED (no global orderBy/limit — the old
    ``limit=1<<30`` both sorted every candidate pair globally and
    silently truncated past 2^30)."""
    if n_planes is None:
        n_planes = scaled_n_planes(
            sum(embedding_width_census(seen_emb).values()),
            target_bucket_size)
    hit = (embedding_pairs_cross(new_emb, seen_emb, n_planes=n_planes,
                                 tau=tau, width=width)
           .select(F.col("doc_a").alias("vec_id")).distinct())
    fresh = new_emb.join(hit, "vec_id", "left_anti")
    batch_bits = scaled_n_planes(
        sum(embedding_width_census(new_emb).values()),
        target_bucket_size, floor=4)
    within = (banded_cosine_pairs(fresh, n_bands=within_bands,
                                  band_bits=batch_bits, limit=None)
              .filter(F.col("cosine") >= tau)
              .select("doc_a", "doc_b"))
    memb = connected_components(within)
    return (fresh.join(memb.select(F.col("doc_id").alias("vec_id"),
                                   "cluster_id"),
                       "vec_id", "left")
            .filter(F.col("cluster_id").isNull()
                    | (F.col("vec_id") == F.col("cluster_id")))
            .drop("cluster_id"))


def banded_cosine_pairs(emb: DataFrame, n_bands: int = 2,
                        band_bits: int | None = None,
                        target_bucket_size: int = 64,
                        limit: int | None = 20,
                        census: dict[int, int] | None = None) -> DataFrame:
    """Frame-in core of :func:`dedup_embedding_cosine_banded` (columns
    ``vec_id``, ``embedding``). ``limit=None`` returns EVERY verified
    pair unsorted — the bulk-consumer form (incremental dedup,
    connected components): no global orderBy, no truncation.

    ``census``: a caller-precomputed :func:`embedding_width_census`
    for a SUPERSET frame of ``emb`` (r19, guide §1.2): the census is
    a driver action, and the per-trigger incremental path already
    censused its batch — re-counting the derived survivor subset here
    cost one extra plan execution per trigger for the same width
    answer (a subset of a uniform-width frame is uniform or empty).
    """
    if census is None:
        census = embedding_width_census(emb)
    if band_bits is None:
        band_bits = scaled_n_planes(sum(census.values()),
                                    target_bucket_size)
    widths = [w for w in census if w >= 0]
    if len(census) != 1 or len(widths) != 1:
        raise ValueError(
            "dedup_embedding_cosine_banded needs a uniform-width, "
            f"non-NULL embedding corpus; width census: {census}")
    dim = widths[0]
    norms = emb.select(
        "vec_id", "embedding",
        F.sqrt(F.expr(_SPARK_DOT.format(a="embedding", b="embedding")))
        .alias("nrm"),
        *[sign_bucket_col(band_bits, dim, plane_offset=b * band_bits)
          .alias(f"_band{b}") for b in range(n_bands)])
    # ids-only through the band join (the minhash pattern): the heavy
    # embedding arrays never enter the exploded frame or the exchange.
    bands = norms.select("vec_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band_idx"),
                 F.col(f"_band{b}").alias("band_val"))
        for b in range(n_bands)])).alias("bd")).select(
        "vec_id", "bd.band_idx", "bd.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.band_val") == F.col("b.band_val"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("doc_a"),
                     F.col("b.vec_id").alias("doc_b"))
             .distinct())
    na = norms.select(F.col("vec_id").alias("doc_a"),
                      F.col("embedding").alias("emb_a"),
                      F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("vec_id").alias("doc_b"),
                      F.col("embedding").alias("emb_b"),
                      F.col("nrm").alias("nrm_b"))
    dot = F.expr(_SPARK_DOT.format(a="emb_a", b="emb_b"))
    scored = (pairs.join(na, "doc_a").join(nb, "doc_b")
              .select("doc_a", "doc_b",
                      F.try_divide(dot, F.col("nrm_a") * F.col("nrm_b"))
                      .alias("cosine")))
    if limit is None:
        return scored
    return (scored
            .orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(limit))


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components over dup pairs)
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 15


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_MINHASH_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM dup_pairs),
    reach(doc_id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
    memb AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM memb GROUP BY cluster_id),
    words AS (SELECT doc_id, len(string_split(text, ' ')) AS nw FROM docs),
    rk AS (SELECT m.doc_id,
                  ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                                     ORDER BY w.nw DESC, m.doc_id ASC) AS r
           FROM memb m JOIN words w USING (doc_id))
    SELECT m.doc_id, m.cluster_id, s.cluster_size,
           m.doc_id = m.cluster_id AS keep,
           rk.r = 1 AS keep_by_words
    FROM memb m JOIN sizes s USING (cluster_id) JOIN rk USING (doc_id)
    """,
    tags=("dedup", "llm-data", "graph"),
    doc="Duplicate-cluster resolution: connected components over the "
        "MinHash-verified duplicate pairs (min-label propagation), "
        "canonical keeper = min doc_id per component, PLUS the "
        "quality-keeper decision (keep_by_words: the RefinedWeb-style "
        "longest-doc keeper via dedup_survivors_by, ties to min id) — "
        "both dedup decisions a training pipeline chooses between, "
        "hash-pinned per cluster (r15 catalog promotion).",
)
def dedup_clusters(spark, sf_dir: str) -> DataFrame:
    """Cluster duplicate pairs into components and pick keepers.

    Distributed min-label propagation: each iteration is one equi-join
    shuffle (edges ⋈ labels) + a map-side-combined min aggregation;
    `localCheckpoint` truncates the lineage so plans stay O(1) per
    iteration. Iteration count = component diameter — near-dup
    components are near-cliques (every copy pairwise-similar), so this
    converges in ~2 rounds; a pathological chain is bounded by
    _CC_MAX_ITERS. The driver loop holds only a changed-row count, never
    row data. At 100 TB the same loop holds (the alternating
    small-star/large-star variant would cut worst-case rounds to
    O(log^2 n)); edges/labels are pre-partitioned on the join key so
    every iteration reuses one hash partitioning.

    Beyond-reference training-data operator (no analog in
    /root/reference); completes the dedup family: pair finders say
    "these two match", this says "keep doc X, drop its whole cluster".
    """
    docs = docs_with_dups(spark, sf_dir)
    pairs = _minhash_verified_pairs(docs).select("doc_a", "doc_b")
    memb = connected_components(pairs)
    sizes = memb.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    # the quality-keeper rule, via the REAL apply operator (r15
    # catalog promotion of dedup_survivors_by): survivors under the
    # word-count score, restricted back to clustered rows — every
    # cluster contributes exactly one keep_by_words=true row (the
    # longest member, ties to min id)
    keepers = (dedup_survivors_by(docs, memb,
                                  F.size(F.split("text", " ")))
               .select("doc_id").withColumn("_kbw", F.lit(True)))
    return (memb.join(sizes, "cluster_id")
            .join(keepers, "doc_id", "left")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
                    F.coalesce(F.col("_kbw"), F.lit(False))
                    .alias("keep_by_words")))


def connected_components(pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) undirected edges -> (doc_id, cluster_id=min in comp).

    Min-label propagation until fixpoint; see :func:`dedup_clusters` for
    the scale analysis.
    """
    # pairs is the expensive upstream (banded join + Jaccard verify) and
    # the union below reads it TWICE — eager checkpoint, so both
    # branches read cached blocks instead of racing to compute it.
    pairs = pairs.localCheckpoint()
    # edges/labels checkpoints are LAZY (r18, guide §1.2 "fewer
    # passes"): both derive cheaply from the pairs cache, so they
    # materialize inside iteration 1's job instead of costing two
    # standalone driver jobs; lineage still truncates at first use.
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                       F.col("doc_a").alias("dst")))
             .repartition("dst")
             .localCheckpoint(eager=False))
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .select("doc_id", F.col("doc_id").alias("label"))
              .localCheckpoint(eager=False))

    def _hop(lbl: DataFrame) -> DataFrame:
        """One min-label propagation step: (doc_id, label, chg)."""
        nbr = (edges.alias("e")
               .join(lbl.alias("l"), F.col("e.dst") == F.col("l.doc_id"))
               .groupBy(F.col("e.src").alias("src"))
               .agg(F.min("l.label").alias("nbr_min")))
        return (lbl.alias("l2")
                .join(nbr.alias("n"),
                      F.col("l2.doc_id") == F.col("n.src"), "left")
                .select(F.col("l2.doc_id").alias("doc_id"),
                        F.least(F.col("l2.label"),
                                F.coalesce(F.col("n.nbr_min"),
                                           F.col("l2.label")))
                        .alias("label"),
                        (F.col("n.nbr_min") < F.col("l2.label"))
                        .alias("chg")))

    # TWO propagation hops per materialized job (r19, guide §1.2 fewer
    # passes): each driver round composes hop->hop into one plan, and
    # the count BOTH materializes the lazy checkpoint and reads the
    # changed tally (the r18 fusion). Convergence reads HOP 2's chg
    # only: chg2 == 0 means applying propagation to hop 1's labels
    # changed nothing, i.e. hop 1 already reached the fixpoint and
    # hop 2 returned it unchanged — sound regardless of chg1. Near-dup
    # components are near-cliques (diameter ~1), so the common case is
    # ONE job (hop1 propagates, hop2 confirms) where the single-hop
    # loop paid two. Executed hop work is unchanged; only driver
    # round-trips halve — per batch in the streaming dedup loop too.
    for _ in range((_CC_MAX_ITERS + 1) // 2):
        new_labels = (_hop(_hop(labels).drop("chg"))
                      .localCheckpoint(eager=False))
        changed2 = new_labels.filter("chg").count()
        labels = new_labels.drop("chg")
        if changed2 == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dedup_survivors_by(docs: DataFrame, membership: DataFrame,
                       score_col, id_col: str = "doc_id") -> DataFrame:
    """:func:`dedup_survivors` with a QUALITY keeper rule: per
    duplicate cluster keep the row maximizing ``score_col`` (ties
    broken by min id — fully deterministic), instead of the min-id
    canonical. The knob real curation pipelines want (e.g. RefinedWeb
    keeps the longest/cleanest near-dup, not the lowest-numbered one);
    ``score_col`` is any Column over ``docs``' columns — length,
    quality score, perplexity negated, recency.

    Scale: the rank window runs over CLUSTERED rows only (an inner
    join against membership — normally a small corpus fraction), so
    unclustered docs never enter a window partition; a NULL-cluster
    window would put the whole un-duplicated corpus in ONE skewed
    partition. Two broadcastable-membership joins, never a corpus-wide
    sort."""
    from pyspark.sql import Window

    memb = membership.select(F.col("doc_id").alias("_m_id"),
                             F.col("cluster_id").alias("_m_cluster"))
    clustered = docs.join(memb, F.col(id_col) == F.col("_m_id"))
    w = (Window.partitionBy("_m_cluster")
         .orderBy(F.desc(score_col), F.asc(id_col)))
    keep = (clustered.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col(id_col).alias("_keep_id")))
    return (docs
            .join(memb.select("_m_id"),
                  F.col(id_col) == F.col("_m_id"), "left")
            .join(keep, F.col(id_col) == F.col("_keep_id"), "left")
            .filter(F.col("_m_id").isNull()
                    | F.col("_keep_id").isNotNull())
            .drop("_m_id", "_keep_id"))


def dedup_survivors(docs: DataFrame, membership: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """The APPLY step of the dedup pipeline (r12) — the piece between
    "we found the duplicate clusters" and "here is the training
    corpus": keep every document that appears in NO duplicate cluster,
    plus exactly one canonical representative per cluster (the
    cluster's min-label doc — the label :func:`connected_components`
    already computed, so no extra aggregation).

    ``membership`` is the (doc_id, cluster_id) frame from
    :func:`connected_components` over any pair source (MinHash,
    SimHash, n-gram, embedding-cosine, banded). Returns ``docs`` rows
    unchanged, filtered.

    Scale: membership carries only docs that appeared in some dup pair
    — normally a small corpus fraction, so AQE broadcasts the join;
    the corpus side stays a narrow scan + one equi-join, no shuffle of
    the document payload when broadcast applies. Survivor rule is
    deterministic (min doc id), matching the min-label convention
    everywhere else in this module."""
    memb = membership.select(F.col("doc_id").alias("_m_id"),
                             F.col("cluster_id").alias("_m_cluster"))
    return (docs.join(memb, F.col(id_col) == F.col("_m_id"), "left")
            .filter(F.col("_m_cluster").isNull()
                    | (F.col(id_col) == F.col("_m_cluster")))
            .drop("_m_id", "_m_cluster"))


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — public paper). The reference engine has
# no analog; this is the LLM-data-pipeline modality between exact-hash
# (whole doc) and MinHash (bag-of-shingles): detect VERBATIM token spans
# of length >= k shared across documents, the strongest dedup signal for
# boilerplate and near-verbatim scrapes.
#
# Spark-first formulation (the paper uses a single-node suffix array,
# which does not distribute): a duplicated span of >= k tokens exists
# between two docs iff they share at least one exact k-token window, so
# the detection is: per-position window hashes -> corpus-wide
# duplicated-window set (ONE groupBy on 8-byte longs) -> per-doc
# coverage / capped pair listing. Window hashes are built by DOUBLING —
# h_1[i] = xxhash64(w[i]); h_2m[i] = xxhash64(h_m[i], h_m[i+m]) — so a
# k=2^j window costs j zip_with passes over long arrays, O(n log k) per
# doc instead of the O(n k) naive fold. Collisions: two different
# k-windows colliding in 64 bits is ~n_windows^2 / 2^65 corpus-wide —
# the same budget the MinHash/decontamination families already accept.
# ---------------------------------------------------------------------------


def _window_hash_frame(docs: DataFrame, k: int,
                       distinct: bool = True) -> DataFrame:
    """(doc_id, wh) with per-position k-token window hashes (k a power
    of two), built by log2(k) doubling passes of xxhash64 over shifted
    slices — h_2m[i] = xxhash64(h_m[i], h_m[i+m]) — so a k-window
    costs O(n log k) hash evals per doc.

    Each level is STAGED as its own projection column: a level
    references its predecessor four times (size + two slices), and in
    interpreted evaluation every reference to an unstaged expression
    re-evaluates its whole subtree — chaining the levels as one
    expression tree multiplies the work ~4^log2(k) (measured 9.6 s vs
    0.6 s at sf0.1, the text_repetition staging lesson compounded).
    Position i's hash covers words [i, i+k); docs shorter than k yield
    an empty array (level sizes walk n -> n-1 -> n-3 -> ... -> n-k+1,
    floored at zero)."""
    if k < 1 or (k & (k - 1)) != 0:
        raise ValueError(f"k must be a power of two, got {k}")
    df = docs.select(
        "doc_id",
        F.transform(F.split("text", " "),
                    lambda w: F.xxhash64(w)).alias("_wh"))
    m = 1
    while m < k:
        h = F.col("_wh")
        n_out = F.greatest(F.size(h) - m, F.lit(0))
        df = df.select(
            "doc_id",
            F.zip_with(F.slice(h, 1, n_out), F.slice(h, m + 1, n_out),
                       lambda a, b: F.xxhash64(a, b)).alias("_wh"))
        m *= 2
    wh = F.array_distinct("_wh") if distinct else F.col("_wh")
    return df.select("doc_id", wh.alias("wh"))


def substring_duplicate_windows(docs: DataFrame, k: int = 32) -> DataFrame:
    """(window_hash, n_docs) for every k-token window appearing in MORE
    than one document — the corpus-wide duplicated-span index.

    Scale: the explode emits one LONG per token position (comparable
    to the decontamination gram explode, which this repo already runs
    hashed for the same reason); the groupBy partial-aggregates
    map-side. Per-doc distinct window hashes ride array_distinct
    BEFORE the explode so a span repeated WITHIN one doc cannot fake a
    cross-doc duplicate."""
    per_doc = _window_hash_frame(docs, k)
    # explode_outer, NOT explode: an inner explode makes Catalyst infer
    # a size(wh) > 0 filter (InferFiltersFromGenerate) that pushes the
    # WHOLE window-hash chain into a pre-shuffle Filter — re-evaluated
    # per row on the unspread scan stage (measured 91 s vs 6 s at
    # sf0.1). The NULL rows from empty arrays are dropped on the
    # GENERATED column, which nothing can push past the Generate.
    return (per_doc.select(F.explode_outer("wh").alias("window_hash"))
            .filter(F.col("window_hash").isNotNull())
            .groupBy("window_hash")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > 1))


def exact_substring_coverage(docs: DataFrame, k: int = 32) -> DataFrame:
    """Per-doc duplicated-span coverage: of the doc's k-token windows,
    the fraction whose exact content appears in at least one OTHER
    document — the Lee et al. removal criterion (drop/trim docs whose
    coverage exceeds a threshold).

    Columns: doc_id, n_windows, n_dup_windows, dup_frac. Docs shorter
    than k tokens carry n_windows=0 and NULL dup_frac. Two corpus
    passes (the duplicated-window set must see every doc before any
    doc can be scored) + one long-keyed semi-join — the distributed
    floor for this statistic."""
    dup = substring_duplicate_windows(docs, k).select("window_hash")
    per_doc = _window_hash_frame(docs, k)
    # n_windows is count(window_hash) POST-explode, never size(wh)
    # carried beside the generate — a second reference to the staged
    # chain column next to explode defeats the level staging during
    # optimization (~4^levels plan nodes; see _substring_fp_exploded's
    # r14 planning-trap note). wh is array_distinct output (no NULL
    # elements), so the count equals the array size exactly.
    exploded = per_doc.select(
        "doc_id", F.explode_outer("wh").alias("window_hash"))
    # count each doc's windows that are corpus-duplicated. explode_outer
    # keeps too-short docs (NULL window, count 0) in the report.
    scored = (exploded.join(dup.withColumn("_dup", F.lit(1)),
                            "window_hash", "left")
              .groupBy("doc_id")
              .agg(F.count(F.col("window_hash")).cast("int")
                   .alias("n_windows"),
                   F.count(F.col("_dup")).alias("n_dup_windows")))
    return scored.select(
        "doc_id", "n_windows", "n_dup_windows",
        F.when(F.col("n_windows") > 0,
               F.col("n_dup_windows").cast("double")
               / F.col("n_windows")).alias("dup_frac"))


def exact_substring_pairs(docs: DataFrame, k: int = 32,
                          max_docs_per_window: int = 64) -> DataFrame:
    """(doc_a, doc_b, n_shared_windows) for every document pair sharing
    at least one exact k-token window, doc_a < doc_b.

    Scale guard: a boilerplate window shared by m docs contributes
    C(m,2) pairs — ``max_docs_per_window`` drops windows above that
    population (the standard stop-window cut; such spans are corpus
    boilerplate better handled by the coverage report than a pair
    list). The join is an equi-join on the window hash — blocked, like
    the MinHash band join, never a cross join."""
    per_doc = _window_hash_frame(docs, k)
    # explode_outer + isNotNull: see substring_duplicate_windows
    exploded = (per_doc.select(
        "doc_id", F.explode_outer("wh").alias("window_hash"))
        .filter(F.col("window_hash").isNotNull()))
    eligible = (exploded.groupBy("window_hash")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter((F.col("n") > 1)
                        & (F.col("n") <= max_docs_per_window))
                .select("window_hash"))
    hits = exploded.join(eligible, "window_hash")
    a, b = hits.alias("a"), hits.alias("b")
    return (a.join(b, (F.col("a.window_hash") == F.col("b.window_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_windows")))


def exact_substring_survivors(docs: DataFrame, k: int = 32,
                              max_dup_frac: float = 0.5) -> DataFrame:
    """The APPLY step: ``docs`` rows whose duplicated-window coverage
    (:func:`exact_substring_coverage`) is at most ``max_dup_frac`` —
    the Lee et al. 2022 removal criterion as a filter a pipeline
    writes back out. Docs too short to carry a k-window pass (the
    length gates own short docs, as in build_training_corpus). Rows
    come back unchanged; the flagged side is the anti-join complement.

    Scale: coverage's two corpus passes + one ids-only semi-join —
    nothing here holds the corpus, and the duplicated-window set is
    the only state that crosses the passes."""
    flagged = (exact_substring_coverage(docs, k)
               .filter(F.col("dup_frac") > max_dup_frac)
               .select("doc_id"))
    return docs.join(flagged, "doc_id", "left_anti")


def substring_fingerprint_frame(docs: DataFrame, k: int = 32,
                                w: int = 16) -> DataFrame:
    """(doc_id, fps) winnowed substring fingerprints — the 100 TB form
    of the window-hash index (Schleimer et al. 2003, MOSS winnowing;
    public paper). Exploding EVERY k-token window hash shuffles
    ~token-count x 8 bytes corpus-wide; winnowing keeps, per position,
    only the MINIMUM hash of each ``w`` consecutive window hashes —
    expected volume ~2/(w+1) of all-positions — with the classic
    alignment-free guarantee: any shared verbatim span of
    >= k + w - 1 tokens contains the same w consecutive window hashes
    in both documents, so both select that window's minimum — a shared
    fingerprint, wherever the span sits in either doc. Spans in
    [k, k+w-1) may be missed (the documented trade); a fingerprint
    match still implies a genuine shared k-token window (precision
    unchanged, modulo 64-bit collisions).

    The sliding min runs by the same staged DOUBLING as the window
    hashes (min is idempotent, so overlapping composition is exact for
    ANY w): m_2a[i] = least(m_a[i], m_a[i+a]), then one overlapped
    combine m_w[i] = least(m_p[i], m_p[i+w-p]) for the largest power
    of two p <= w. O(n log w) per doc, every level its own projection
    column."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    df = _window_hash_frame(docs, k, distinct=False)  # staged chain
    a = 1
    while 2 * a <= w:
        h = F.col("wh")
        n_out = F.greatest(F.size(h) - a, F.lit(0))
        df = df.select(
            "doc_id",
            F.zip_with(F.slice(h, 1, n_out), F.slice(h, a + 1, n_out),
                       lambda x, y: F.least(x, y)).alias("wh"))
        a *= 2
    if a < w:
        h = F.col("wh")
        n_out = F.greatest(F.size(h) - (w - a), F.lit(0))
        df = df.select(
            "doc_id",
            F.zip_with(F.slice(h, 1, n_out),
                       F.slice(h, w - a + 1, n_out),
                       lambda x, y: F.least(x, y)).alias("wh"))
    return df.select("doc_id", F.array_distinct("wh").alias("fps"))


def exact_substring_pairs_winnowed(docs: DataFrame, k: int = 32,
                                   w: int = 16,
                                   max_docs_per_window: int = 64
                                   ) -> DataFrame:
    """(doc_a, doc_b, n_shared_fps) — :func:`exact_substring_pairs`
    over winnowed fingerprints instead of every window position: the
    deployment form whose exploded volume is ~2/(w+1) of
    all-positions. Guaranteed to pair docs sharing a verbatim span of
    >= k + w - 1 tokens (see :func:`substring_fingerprint_frame`);
    every reported pair genuinely shares >= 1 exact k-token window.
    Same stop-window cut as the exact form."""
    per_doc = substring_fingerprint_frame(docs, k, w)
    exploded = (per_doc.select(
        "doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull()))
    eligible = (exploded.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter((F.col("n") > 1)
                        & (F.col("n") <= max_docs_per_window))
                .select("fp"))
    hits = exploded.join(eligible, "fp")
    a, b = hits.alias("a"), hits.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_fps")))


# ---------------------------------------------------------------------------
# Append-only exact-substring dedup (VERDICT r13 item 2): the cross /
# incremental forms over winnowed fingerprints, the recompute twins of
# the materialized "substring" index kind (operators/dedup_index.py).
# ---------------------------------------------------------------------------

def _substring_fp_exploded(docs: DataFrame, k: int, w: int) -> DataFrame:
    """(doc_id, fp) — winnowed fingerprints exploded; explode_outer
    keeps too-short docs (NULL fp) visible to consumers, so a per-doc
    fingerprint count is recoverable post-generate as count(fp).

    PLANNING trap (r14, the third staged-chain lesson): do NOT carry
    ``size(fps)`` in the same projection as ``explode(fps)``. A second
    reference to the chain column beside a Generate defeats the
    level-staging during OPTIMIZATION — PhysicalOperation/alias
    inlining substitutes the staged levels into one mega-expression
    (~4^levels nodes; k=32+w=16 is 9 levels) and every subsequent rule
    walks it: measured 145 s of pure PLAN time (1.6 s with the count
    derived post-explode), and the r14 scale probe originally hung in
    ``trimAliases`` for 50+ minutes at sf1.0. Counts over generated
    columns are free; references to the generator's child are not."""
    per_doc = substring_fingerprint_frame(docs, k, w)
    return per_doc.select("doc_id", F.explode_outer("fps").alias("fp"))


def substring_pairs_cross(new_docs: DataFrame, seen_docs: DataFrame,
                          k: int = 32, w: int = 16,
                          max_docs_per_window: int = 64) -> DataFrame:
    """(doc_a=new doc_id, doc_b=seen doc_id, n_shared_fps) — document
    pairs ACROSS two corpora sharing winnowed substring fingerprints:
    the append-only form of :func:`exact_substring_pairs_winnowed`
    (the seen corpus is never re-paired against itself; a pair implies
    a genuine shared >= k-token verbatim window, guaranteed for spans
    >= k + w - 1). Stop-window cut on the COMBINED per-fingerprint
    population (a boilerplate span present in m docs across both sides
    still caps at max_docs_per_window)."""
    fp_n = (_substring_fp_exploded(new_docs, k, w)
            .filter(F.col("fp").isNotNull()).select("doc_id", "fp"))
    fp_s = (_substring_fp_exploded(seen_docs, k, w)
            .filter(F.col("fp").isNotNull()).select("doc_id", "fp"))
    pop = (fp_n.select("fp").unionByName(fp_s.select("fp"))
           .groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") <= max_docs_per_window).select("fp"))
    return (fp_n.join(pop, "fp").alias("a")
            .join(fp_s.alias("b"), F.col("a.fp") == F.col("b.fp"))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_fps")))


def substring_incremental_survivors(new_docs: DataFrame,
                                    seen_docs: DataFrame,
                                    k: int = 32, w: int = 16,
                                    max_dup_frac: float = 0.5
                                    ) -> DataFrame:
    """Append-only exact-substring dedup: ``new_docs`` rows whose
    duplicated-fingerprint coverage — the fraction of the doc's
    winnowed fingerprints that appear in the SEEN corpus or in another
    doc of the same batch — is at most ``max_dup_frac``. The
    incremental twin of :func:`exact_substring_survivors`'s coverage
    ceiling, with fingerprint coverage standing in for window coverage
    (an unbiased ~2/(w+1) positional sample; spans >= k + w - 1 always
    contribute at least one shared fingerprint). Docs too short to
    carry a fingerprint pass — the length gates own them.

    No verify re-attach is needed (unlike MinHash): a fingerprint
    equality IS the evidence — it implies a shared exact k-token
    window directly (64-bit collision budget as everywhere else), so
    the seen corpus contributes only its fingerprint SET. That is what
    makes the materialized "substring" index self-sufficient: the
    indexed probe never touches seen raw text."""
    seen_fps = (_substring_fp_exploded(seen_docs, k, w)
                .filter(F.col("fp").isNotNull())
                .select("fp").distinct())
    return _substring_survivors_against(new_docs, seen_fps, k, w,
                                        max_dup_frac)


def _substring_survivors_against(new_docs: DataFrame,
                                 seen_fps: DataFrame,
                                 k: int, w: int,
                                 max_dup_frac: float) -> DataFrame:
    """Shared core of the recompute and indexed incremental forms:
    score each new doc's fingerprint coverage against ``seen_fps``
    (a distinct (fp) frame) plus within-batch duplicated fingerprints,
    and keep rows at or under the ceiling. The coverage denominator
    (per-doc fingerprint count) is count(fp) POST-explode — never a
    size() carried beside the generate (see _substring_fp_exploded's
    planning-trap note); explode_outer's NULL row makes too-short docs
    count 0 and pass."""
    batch = _substring_fp_exploded(new_docs, k, w)
    within_dup = (batch.filter(F.col("fp").isNotNull())
                  .groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
                  .filter(F.col("n") > 1).select("fp"))
    dup_fps = (seen_fps.select("fp").unionByName(within_dup)
               .distinct().withColumn("_dup", F.lit(1)))
    flagged = (batch.join(dup_fps, "fp", "left")
               .groupBy("doc_id")
               .agg(F.count(F.col("fp")).alias("n_fps"),
                    F.count(F.col("_dup")).alias("n_dup"))
               .filter((F.col("n_fps") > 0)
                       & (F.col("n_dup").cast("double") / F.col("n_fps")
                          > max_dup_frac))
               .select("doc_id"))
    return new_docs.join(flagged, "doc_id", "left_anti")
