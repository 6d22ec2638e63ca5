"""Corpus-curation operators: eval-set decontamination and
embedding-space curation (k-means + SemDeDup-style pruning).

Beyond-reference operators (no analog in /root/reference) — the last
two corpus-preparation steps a large-scale LLM training pipeline runs
that the engine didn't already cover:

- **Decontamination**: training corpora must not contain benchmark/eval
  text. Two standard detectors over a deterministic eval split
  (``doc_id % EVAL_MOD == 0`` stands in for the external eval set):
  word-4-gram collision (the GPT-3/PaLM-style n-gram overlap test) and
  exact content-hash membership (cross-corpus exact dedup).
- **Embedding curation**: Lloyd's k-means over the embedding column with
  deterministic init, then SemDeDup-style semantic pruning *within*
  clusters (drop a vector when a lower-id cluster-mate is within a
  cosine threshold — Abbas et al. 2023's cluster-then-prune shape).

Scale design (100 TB):
- the eval side of decontamination is SMALL by nature (benchmarks are
  MBs); its distinct n-gram / digest sets broadcast, so the corpus-side
  plan is a narrow explode + broadcast semi-join — no corpus shuffle.
  ``array_distinct`` runs per-document BEFORE the explode so duplicate
  grams inside one document never reach the join.
- k-means centroids live on the driver (k x dims doubles — the same
  pattern as Spark MLlib and this repo's IVF coarse quantizer,
  operators/similarity.py:174): every assignment pass is a NARROW
  literal-centroid argmin fold, zero exchanges; each update collects
  exactly k aggregate rows. Iterations scan the corpus, never hold it.
- SemDeDup's pairwise compare is confined within clusters (the whole
  point of the algorithm): cost is sum(cluster_size^2), bounded by
  scaling k with the corpus so cluster_size stays ~constant — the
  catalog entry pins k=8 for the oracle; ``kmeans_assign`` takes k as
  a parameter for the scaled deployment.

Determinism (hash-match with the DuckDB oracle): distances/cosines are
ordered 64-dim folds (bitwise identical across engines — see
operators/dedup.py); centroid means and inertia go through the repo's
DECIMAL(24,6) exact-sum recipe (plans/analytics.py dsum/davg), so they
are partitioning-order-independent and engine-identical; every argmin
breaks ties toward the smaller cluster id on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..catalog import register
from ..tables import load_spread, load_table
from .dedup import _SPARK_DOT, _SQL_DOT

# --- decontamination ------------------------------------------------------

NGRAM = 4          # word n-gram width for the collision test
EVAL_MOD = 37      # doc_id % EVAL_MOD == 0 -> eval split (~2.7%)

# --- embedding curation ---------------------------------------------------

KM_K = 8           # clusters (oracle-pinned; kmeans_assign takes any k)
KM_ITERS = 3       # Lloyd iterations (deterministic, fixed)
KM_DIMS = 64       # embedding width (asserted at centroid collect)
SEM_TAU = 0.30     # SemDeDup cosine threshold (data-calibrated: the
                   # synthetic corpus has no true near-dups, max pair
                   # cosine ~0.51; production default would be ~0.95)


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------

def _gram_col(words: str = "w", n: int = NGRAM) -> F.Column:
    """Per-document distinct word n-grams (narrow, pre-explode).

    ``sequence(1, size-n+1)`` is DESCENDING when the doc is shorter than
    n (Spark generates start-down-to-stop), so the short-doc case is
    guarded explicitly instead of relying on an empty sequence.
    """
    return F.expr(
        f"CASE WHEN size({words}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({words}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words}, i, {n})))) "
        f"ELSE CAST(array() AS array<string>) END")


def decontaminate(docs: DataFrame, ngram: int = NGRAM,
                  eval_mod: int = EVAL_MOD) -> DataFrame:
    """Per-language contamination report of the training split against
    the eval split: ``part`` 'ngram' (shares >= 1 word n-gram with any
    eval doc) and 'exact' (md5(text) appears verbatim in the eval set).

    Columns: part, lang, n_train, n_flagged, rate.
    """
    base = docs.select("doc_id", "lang", "text",
                       F.split("text", " ").alias("w"))
    is_eval = (F.col("doc_id") % eval_mod) == 0
    grams = base.select("doc_id", "lang", is_eval.alias("ev"),
                        F.explode(_gram_col("w", ngram)).alias("gram"))
    eval_grams = grams.filter("ev").select("gram").distinct()
    ngram_hit = (grams.filter(~F.col("ev"))
                 .join(F.broadcast(eval_grams), "gram", "leftsemi")
                 .select("doc_id").distinct())

    train = (base.filter(~is_eval)
             .select("doc_id", "lang", F.md5("text").alias("h")))
    eval_hashes = (base.filter(is_eval)
                   .select(F.md5("text").alias("h")).distinct())

    rate = (F.count(F.col("_hit")).cast("double")
            / F.count(F.lit(1))).alias("rate")
    ngram_part = (train
                  .join(F.broadcast(ngram_hit.withColumn("_hit", F.lit(1))),
                        "doc_id", "left")
                  .groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n_train"),
                       F.count(F.col("_hit")).alias("n_flagged"), rate)
                  .select(F.lit("ngram").alias("part"), "lang",
                          "n_train", "n_flagged", "rate"))
    exact_part = (train
                  .join(F.broadcast(eval_hashes.withColumn("_hit", F.lit(1))),
                        "h", "left")
                  .groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n_train"),
                       F.count(F.col("_hit")).alias("n_flagged"), rate)
                  .select(F.lit("exact").alias("part"), "lang",
                          "n_train", "n_flagged", "rate"))
    return ngram_part.unionByName(exact_part)


_SQL_DECON = f"""
    WITH tok AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w
      FROM documents),
    g AS (
      SELECT doc_id, lang, doc_id % {EVAL_MOD} = 0 AS ev,
             unnest(list_distinct(list_transform(
               range(1, len(w) - {NGRAM - 2}),
               i -> array_to_string(w[i:i+{NGRAM - 1}], ' ')))) AS gram
      FROM tok),
    ev_g AS (SELECT DISTINCT gram FROM g WHERE ev),
    ngram_hit AS (
      SELECT DISTINCT g.doc_id FROM g JOIN ev_g USING (gram)
      WHERE NOT g.ev),
    train AS (
      SELECT doc_id, lang, md5(text) AS h FROM documents
      WHERE doc_id % {EVAL_MOD} <> 0),
    ev_h AS (SELECT DISTINCT md5(text) AS h FROM documents
             WHERE doc_id % {EVAL_MOD} = 0)
    SELECT 'ngram' AS part, t.lang, COUNT(*) AS n_train,
           COUNT(nh.doc_id) AS n_flagged,
           CAST(COUNT(nh.doc_id) AS DOUBLE) / COUNT(*) AS rate
    FROM train t LEFT JOIN ngram_hit nh USING (doc_id) GROUP BY t.lang
    UNION ALL
    SELECT 'exact' AS part, t.lang, COUNT(*) AS n_train,
           COUNT(e.h) AS n_flagged,
           CAST(COUNT(e.h) AS DOUBLE) / COUNT(*) AS rate
    FROM train t LEFT JOIN ev_h e USING (h) GROUP BY t.lang
"""


@register(
    "corpus_decontaminate",
    oracle=_SQL_DECON,
    tags=("training-data", "llm-data", "decontamination", "dedup"),
    doc="Eval-set decontamination battery: word-4-gram collision "
        "(GPT-3-style overlap test) and exact-hash cross-corpus dedup "
        "of the training split against the deterministic eval split. "
        "Eval-side gram/digest sets broadcast (benchmarks are MBs even "
        "at 100 TB corpus scale) — the corpus plan is a narrow "
        "per-doc-distinct explode + broadcast semi-join, no shuffle.",
)
def corpus_decontaminate(spark, sf_dir: str) -> DataFrame:
    return decontaminate(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# K-means + SemDeDup
# ---------------------------------------------------------------------------

def _sqdist_to(centroid: list[float]) -> F.Column:
    """Ordered-fold squared L2 distance to a literal centroid —
    dimension order 1..dims, bitwise identical to the oracle's
    list_reduce (same add/sub/mul sequence)."""
    c_arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col("embedding"), c_arr,
                   lambda x, y: (x.cast("double") - y)
                   * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def _assign(emb: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """Narrow argmin fold over literal centroids: adds (cluster, dist).
    Strict ``<`` keeps the first (smallest cluster id) on exact ties —
    the same total order as ROW_NUMBER(ORDER BY dist, cluster)."""
    choices = [F.struct(_sqdist_to(c).alias("dist"),
                        F.lit(cid).alias("cid"))
               for cid, c in sorted(centroids.items())]
    best = F.aggregate(
        F.slice(F.array(*choices), 2, len(choices) - 1), choices[0],
        lambda acc, c: F.when(c["dist"] < acc["dist"], c).otherwise(acc))
    return emb.select("vec_id", "embedding",
                      best["cid"].alias("cluster"),
                      best["dist"].alias("dist"))


def kmeans_assign(emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS,
                  dims: int = KM_DIMS) -> DataFrame:
    """Lloyd's k-means with deterministic init (the embeddings of the k
    smallest vec_ids) and a fixed iteration count; returns the final
    assignment frame (vec_id, embedding, cluster, dist).

    Centroids live on the driver (k x dims doubles — MLlib's pattern):
    each update collects exactly k rows of DECIMAL(24,6)-exact per-dim
    means, so the result is independent of partitioning; each assignment
    is a zero-exchange narrow projection. An empty cluster keeps its
    previous centroid (both engines).
    """
    init = sorted(emb.select("vec_id", "embedding")
                  .filter(F.col("vec_id") < k).collect(),
                  key=lambda r: r.vec_id)
    if len(init) != k:
        raise ValueError(f"k-means init expects vec_id 0..{k-1}; "
                         f"found {len(init)} rows")
    if any(len(r.embedding) != dims for r in init):
        raise ValueError(f"embedding width != {dims}")
    cents = {i: [float(x) for x in r.embedding] for i, r in enumerate(init)}
    mean_aggs = [
        (F.sum(F.col("embedding")[d].cast("double").cast("decimal(24,6)"))
         .cast("double") / F.count(F.lit(1))).alias(f"c{d}")
        for d in range(dims)]
    for _ in range(iters):
        sums = (_assign(emb, cents).groupBy("cluster")
                .agg(*mean_aggs).collect())
        new = dict(cents)  # empty cluster -> keep previous centroid
        for r in sums:
            new[int(r.cluster)] = [float(r[f"c{d}"]) for d in range(dims)]
        cents = new
    return _assign(emb, cents)


def semdedup_flags(assigned: DataFrame, tau: float = SEM_TAU) -> DataFrame:
    """SemDeDup-style within-cluster pruning: a vector is dropped when
    ANY lower-vec_id cluster-mate is within cosine > tau (the
    exists-earlier-neighbor formulation — one self-join, no sequential
    dependency; the keep-only-against-representatives variant needs
    iterative passes and differs only on chained-similarity cases).
    Returns (vec_id, cluster, dropped)."""
    norms = assigned.select(
        "vec_id", "cluster", "embedding",
        F.sqrt(F.expr(_SPARK_DOT.format(a="embedding", b="embedding")))
        .alias("nrm"))
    a = norms.select(F.col("vec_id").alias("a_id"),
                     F.col("cluster").alias("a_cl"),
                     F.col("embedding").alias("a_emb"),
                     F.col("nrm").alias("a_nrm"))
    dot = F.expr(_SPARK_DOT.format(a="a_emb", b="embedding"))
    dropped = (a.join(norms, (F.col("a_cl") == F.col("cluster"))
                      & (F.col("a_id") < F.col("vec_id")))
               .filter(dot / (F.col("a_nrm") * F.col("nrm")) > tau)
               .select("vec_id").distinct())
    return (norms.join(F.broadcast(dropped.withColumn("_d", F.lit(1))),
                       "vec_id", "left")
            .select("vec_id", "cluster",
                    F.col("_d").isNotNull().alias("dropped")))


def _km_sql() -> str:
    """Machine-generated oracle for embedding_curation: KM_ITERS
    unrolled Lloyd iterations (cross join of the corpus with the k
    centroid rows per iteration — fine at oracle SF), then the k-means
    rollup and the within-cluster SemDeDup part."""
    sqd = ("list_reduce(list_prepend(0.0::DOUBLE, list_transform("
           "list_zip({a}, {b}), p -> (p[1]::DOUBLE - p[2]::DOUBLE) * "
           "(p[1]::DOUBLE - p[2]::DOUBLE))), (acc, v) -> acc + v)")
    mean_list = ", ".join(
        f"CAST(SUM(CAST(CAST(embedding[{d + 1}] AS DOUBLE) "
        f"AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)"
        for d in range(KM_DIMS))
    ctes = [
        "base AS (SELECT vec_id, embedding FROM embeddings)",
        f"cent0 AS (SELECT CAST(vec_id AS INT) AS cluster, "
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c "
        f"FROM embeddings WHERE vec_id < {KM_K})",
    ]
    assign_tpl = """{name} AS (
      SELECT vec_id, embedding, cluster, dist FROM (
        SELECT vec_id, embedding, cluster, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dist, cluster) AS rk
        FROM (SELECT b.vec_id, b.embedding, c.cluster,
                     {sqd} AS dist
              FROM base b CROSS JOIN {cent} c))
      WHERE rk = 1)"""
    for t in range(1, KM_ITERS + 1):
        ctes.append(assign_tpl.format(
            name=f"assign{t}", cent=f"cent{t-1}",
            sqd=sqd.format(a="b.embedding", b="c.c")))
        ctes.append(
            f"sums{t} AS (SELECT cluster, [{mean_list}] AS c_new "
            f"FROM assign{t} GROUP BY cluster)")
        ctes.append(
            f"cent{t} AS (SELECT p.cluster, "
            f"CASE WHEN s.cluster IS NULL THEN p.c ELSE s.c_new END AS c "
            f"FROM cent{t-1} p LEFT JOIN sums{t} s USING (cluster))")
    ctes.append(assign_tpl.format(
        name="final", cent=f"cent{KM_ITERS}",
        sqd=sqd.format(a="b.embedding", b="c.c")))
    dot_aa = _SQL_DOT.format(a="embedding", b="embedding")
    dot_ab = _SQL_DOT.format(a="a.embedding", b="b.embedding")
    ctes.append(f"""norms AS (
      SELECT vec_id, cluster, embedding, sqrt({dot_aa}) AS nrm
      FROM final)""")
    ctes.append(f"""dropped AS (
      SELECT DISTINCT b.vec_id
      FROM norms a JOIN norms b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {dot_ab} / (a.nrm * b.nrm) > {SEM_TAU})""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT 'kmeans' AS part, cluster, COUNT(*) AS n1,
           CAST(NULL AS BIGINT) AS n2,
           CAST(SUM(CAST(dist AS DECIMAL(24,6))) AS DOUBLE) AS v
    FROM final GROUP BY cluster
    UNION ALL
    SELECT 'semdedup' AS part, n.cluster,
           COUNT(*) FILTER (WHERE d.vec_id IS NULL) AS n1,
           COUNT(d.vec_id) AS n2, CAST(NULL AS DOUBLE) AS v
    FROM norms n LEFT JOIN dropped d USING (vec_id) GROUP BY n.cluster""")


@register(
    "embedding_curation",
    oracle=_km_sql(),
    tags=("training-data", "llm-data", "clustering", "semdedup"),
    doc="Embedding-curation battery: deterministic Lloyd's k-means "
        "(k=8, 3 iterations, driver-held centroids — every assignment "
        "a zero-exchange literal-centroid argmin fold, every update a "
        "k-row collect of DECIMAL-exact means) reporting per-cluster "
        "size + inertia, then SemDeDup-style within-cluster cosine "
        "pruning reporting per-cluster kept/dropped.",
)
def embedding_curation(spark, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings")
    # The final assignment fold (k x dims literal argmin) would otherwise
    # be recomputed THREE times — once by the k-means rollup and once per
    # side of the SemDeDup self-join. Persist it (MLlib's iterative
    # pattern; MEMORY_AND_DISK default spills rather than OOMs at scale
    # — the frame is corpus-sized, so a 100 TB deployment would
    # checkpoint it to the lake instead).
    assigned = kmeans_assign(emb).persist()
    km = (assigned.groupBy("cluster")
          .agg(F.count(F.lit(1)).alias("n1"),
               F.sum(F.col("dist").cast("decimal(24,6)")).cast("double")
               .alias("v"))
          .select(F.lit("kmeans").alias("part"), "cluster", "n1",
                  F.lit(None).cast("long").alias("n2"), "v"))
    sem = (semdedup_flags(assigned).groupBy("cluster")
           .agg(F.count(F.when(~F.col("dropped"), 1)).alias("n1"),
                F.count(F.when(F.col("dropped"), 1)).alias("n2"))
           .select(F.lit("semdedup").alias("part"), "cluster", "n1",
                   F.col("n2").cast("long").alias("n2"),
                   F.lit(None).cast("double").alias("v")))
    return km.unionByName(sem)
