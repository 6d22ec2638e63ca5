"""Materialized append-only dedup index (VERDICT r12 item 1).

The r12 incremental primitives (``dedup_pairs_cross`` /
``embedding_pairs_cross``) never re-PAIR the historical corpus, but
they re-DERIVED its features — minhash bands / LSH buckets — from raw
text/vectors on every batch, so per-batch cost still grew with history
size. At a 100 TB seen corpus the per-batch wall is dominated by
re-hashing history, defeating the operators' stated purpose: "never
re-pair history" must also mean "never re-hash history".

This module persists the features as an append-only INDEX table:

- minhash index: ``(doc_id, band_idx, band_val)`` — one row per
  (doc, LSH band), the exact frame the band equi-join consumes;
- embedding index: ``(vec_id, band_idx, bucket, nrm)`` — one row per
  (vector, hyperplane band) plus the norm, the exact frame the
  (band_idx, bucket) equi-join consumes. MULTI-band (ADVICE r13): a
  single band at the corpus-scale plane count keeps a cosine-0.9 pair
  with ~p^bits — vanishing as bits track the corpus — so the index
  stores ``n_bands`` independent ``band_bits``-bit bands (the
  ``banded_cosine_pairs`` plane-offset families) and the probe keeps
  a near-dup with 1-(1-p^bits)^bands, the same S-curve as the
  minhash index's band layout.

Each incremental step (1) hashes ONLY the new batch, (2) probes the
index with a band/bucket equi-join, (3) verifies candidates by
re-attaching raw features for the CANDIDATE ids only (an explicit
semi-join ahead of the feature projection, so history text/vectors are
touched for a vanishing fraction of rows), and (4) appends the
survivors' index rows. Per-batch feature-extraction cost is therefore
O(batch), independent of seen-corpus size; the only O(seen) term left
is the narrow 2-3-column index scan feeding the equi-join (columnar,
tens of bytes/row — and prunable further by bucketing the table on
``band_val`` / ``bucket`` on a real warehouse).

Storage layout: ``<path>/batch=N/`` parquet directories plus a
one-line JSON manifest listing committed batches, published by atomic
rename (the same recipe as the event lake's manifest —
streaming/event_archive.py; its FS facade is reused, so the store
works on local disk and any Hadoop-resolvable URI). A crash between
the parquet write and the manifest swap leaves an orphan directory
that the next append simply overwrites — readers only ever see
committed batches. Single concurrent writer (the corpus maintainer),
any number of readers — the append-only pipeline's natural shape.

Index parameters (minhash band geometry / hyperplane count) are
pinned in the manifest at creation and validated on open: signatures
computed under different parameters are not join-compatible, so a
mismatch is a loud error, never silent zero recall.

No reference analog (/root/reference is a streaming decoder); the
design follows standard LSH index maintenance from the public
literature (Leskovec et al., Mining of Massive Datasets ch. 3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..streaming.event_archive import (_fs_isdir, _fs_listdir,
                                       _fs_read_text, _fs_write_atomic,
                                       _join)
from .dedup import (N_BANDS, N_HASHES, ROWS_PER_BAND, _SPARK_DOT,
                    _bands_from_shingles, _minhash_band_frame,
                    _minhash_verified_pairs, _shingles,
                    _substring_fp_exploded,
                    _substring_survivors_against, _verify_jaccard,
                    banded_signature_rows, connected_components,
                    dedup_survivors)

_INDEX_MANIFEST = "_INDEX_MANIFEST.json"

_SCHEMAS = {
    "minhash": "doc_id long, band_idx int, band_val string",
    "embedding": "vec_id long, band_idx int, bucket long, nrm double",
    "substring": "doc_id long, fp long",
}


def minhash_index_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_val) index rows for a (doc_id, text)
    corpus — the exact band frame ``dedup_minhash_lsh``'s candidate
    join consumes, computed once to be stored."""
    return _bands_from_shingles(
        docs.select("doc_id", _shingles(F.col("text")).alias("shingles")))


def embedding_index_rows(emb: DataFrame, n_bands: int, band_bits: int,
                         width: int | None = None) -> DataFrame:
    """(vec_id, band_idx, bucket, nrm) index rows for a (vec_id,
    embedding) corpus — one row per (vector, band): the banded
    hyperplane signatures plus the norm, everything the (band_idx,
    bucket) join and the cosine verify need from the seen side except
    the (candidate-only) embedding arrays. The norm rides every band
    row (it is 8 bytes against the row's ~20 — cheaper than a second
    per-vector side table at read time)."""
    nrm = emb.select(
        "vec_id",
        F.sqrt(F.expr(_SPARK_DOT.format(a="embedding", b="embedding")))
        .alias("nrm"))
    return (banded_signature_rows(emb, n_bands, band_bits, width=width)
            .join(nrm, "vec_id")
            .select("vec_id", "band_idx", "bucket", "nrm"))


class DedupIndexStore:
    """Append-only feature-index table (see module docstring).

    Use :func:`create_minhash_index` / :func:`create_embedding_index`
    to create, :func:`open_dedup_index` to open; ``append`` commits a
    batch of index rows, ``load`` reads every committed batch."""

    def __init__(self, path: str, kind: str, params: dict,
                 batches: list[str], meta: dict | None = None):
        self.path = path
        self.kind = kind
        self.params = params
        self._batches = batches
        # free-form consumer state published ATOMICALLY with the batch
        # list (e.g. the streaming maintenance loop's last-committed
        # micro-batch id and corpus-batch list): a reader never sees
        # index rows without the meta that committed them, or vice versa
        self.meta = dict(meta or {})

    # -- manifest ------------------------------------------------------
    @classmethod
    def _create(cls, path: str, kind: str, params: dict
                ) -> "DedupIndexStore":
        if _fs_isdir(path) and any(
                not n.startswith(".") for n in _fs_listdir(path)):
            raise ValueError(f"refusing to create dedup index over "
                             f"non-empty directory {path!r}")
        if not _fs_isdir(path) and "://" not in path:
            os.makedirs(path, exist_ok=True)
        store = cls(path, kind, params, [])
        store._write_manifest()
        return store

    @classmethod
    def open(cls, path: str) -> "DedupIndexStore":
        try:
            m = json.loads(_fs_read_text(_join(path, _INDEX_MANIFEST)))
        except (OSError, ValueError) as exc:
            raise FileNotFoundError(
                f"no dedup index manifest under {path!r}") from exc
        return cls(path, m["kind"], m["params"], list(m["batches"]),
                   m.get("meta"))

    def _write_manifest(self) -> None:
        _fs_write_atomic(
            _join(self.path, _INDEX_MANIFEST),
            json.dumps({"version": 1, "kind": self.kind,
                        "params": self.params,
                        "batches": self._batches,
                        "meta": self.meta}))

    def _require(self, kind: str, **params) -> None:
        if self.kind != kind:
            raise ValueError(f"dedup index at {self.path!r} is a "
                             f"{self.kind!r} index, not {kind!r}")
        for k, v in params.items():
            if v is not None and self.params.get(k) != v:
                raise ValueError(
                    f"index parameter mismatch at {self.path!r}: "
                    f"{k}={self.params.get(k)!r} in the manifest, "
                    f"{v!r} requested — signatures under different "
                    "parameters are not join-compatible")

    # -- data ----------------------------------------------------------
    def _next_name(self) -> str:
        """Monotonic batch naming: the counter never reuses an index,
        even after :meth:`compact` shrinks the committed list — a new
        append must never land on a directory an in-flight reader of
        an older manifest may still be scanning."""
        used = [int(n.split("=", 1)[1]) for n in self._batches]
        return f"batch={max(used) + 1 if used else 0}"

    def append(self, index_rows: DataFrame,
               meta_update: dict | None = None) -> str:
        """Commit one batch of index rows; returns the batch dir name.

        The parquet write lands first, the manifest swap publishes it
        — a crash in between leaves an uncommitted orphan that the
        next append overwrites. ``meta_update`` merges into
        :attr:`meta` in the SAME atomic publish (the streaming
        maintenance loop's idempotency handle).

        The batch is validated against the index's FULL schema —
        names and types (VERDICT r13 item 3): a name-only check let a
        mistyped column (e.g. an int ``band_val``) write a
        schema-divergent parquet batch that only failed at a later
        multi-directory read. Type mismatch must be loud at append
        time, like the manifest's parameter guard."""
        from pyspark.sql.types import StructType
        want = {f.name: f.dataType.simpleString()
                for f in StructType.fromDDL(_SCHEMAS[self.kind]).fields}
        got = {f.name: f.dataType.simpleString()
               for f in index_rows.schema.fields}
        if got != want:
            raise ValueError(
                f"{self.kind} index rows need schema {want}, "
                f"got {got}")
        name = self._next_name()
        (index_rows.write.mode("overwrite")
         .parquet(_join(self.path, name)))
        self._batches.append(name)
        if meta_update:
            self.meta.update(meta_update)
        self._write_manifest()
        return name

    def compact(self, spark: SparkSession,
                n_files: int | None = None) -> str:
        """Rewrite every committed batch into ONE batch directory and
        publish a manifest listing only it — the small-files lifecycle
        step an append-only index needs: after B appends the loader
        unions B parquet directories, and at per-trigger append
        cadence B grows without bound (planning cost, file handles,
        and min-file-size row groups all degrade the probe scan).

        Crash-safe the same way append is: the compacted directory
        lands first, the manifest swap publishes it; a crash in
        between leaves the old manifest (and data) fully intact. The
        superseded batch directories are left on disk as orphans so a
        reader holding the PRE-compaction manifest keeps working —
        physical deletion is the owner's separate retention decision
        (same policy as the event lake's snapshot compactor).

        ``n_files`` sizes the rewrite (default: the cluster's
        parallelism, capped at the current batch-dir count)."""
        if not self._batches:
            return ""
        whole = self.load(spark)
        if n_files is None:
            n_files = max(1, min(len(self._batches),
                                 spark.sparkContext.defaultParallelism))
        name = self._next_name()
        (whole.repartition(n_files).write.mode("overwrite")
         .parquet(_join(self.path, name)))
        self._batches = [name]
        self._write_manifest()
        return name

    def load(self, spark: SparkSession) -> DataFrame:
        """Every committed batch as one frame (empty frame with the
        index schema when no batch has been committed yet)."""
        if not self._batches:
            return spark.createDataFrame([], _SCHEMAS[self.kind])
        return spark.read.parquet(
            *[_join(self.path, b) for b in self._batches])


def substring_index_rows(docs: DataFrame, k: int = 32,
                         w: int = 16) -> DataFrame:
    """(doc_id, fp) winnowed exact-substring fingerprints for a
    (doc_id, text) corpus — the rows a "substring" index persists
    (``dedup.substring_fingerprint_frame`` exploded): a fingerprint
    equality IS the duplicate evidence (it implies a shared exact
    k-token window), so unlike the minhash/embedding kinds this index
    needs NO raw-feature re-attach at probe time."""
    return (_substring_fp_exploded(docs, k, w)
            .filter(F.col("fp").isNotNull())
            .select("doc_id", "fp"))


def create_minhash_index(path: str) -> DedupIndexStore:
    """New empty minhash band index; geometry pinned from the module
    constants the finders use (``N_HASHES``/``N_BANDS``/
    ``ROWS_PER_BAND``)."""
    return DedupIndexStore._create(
        path, "minhash", {"n_hashes": N_HASHES, "n_bands": N_BANDS,
                          "rows_per_band": ROWS_PER_BAND})


def create_embedding_index(path: str, n_planes: int,
                           width: int | None = None,
                           n_bands: int = 4) -> DedupIndexStore:
    """New empty hyperplane-signature index at a FIXED band geometry
    (every batch must sign under the same planes to stay
    join-compatible). ``n_planes`` is the PER-BAND signature width in
    bits (pick it with ``dedup.scaled_n_planes`` against the corpus
    size you are building toward, so each band's expected bucket
    population stays bounded); ``n_bands`` independent bands restore
    the recall a single corpus-scale-width band loses (ADVICE r13 —
    keep prob 1-(1-p^bits)^bands vs p^bits; at ``n_bands=1`` the
    layout degenerates to the old single-bucket index)."""
    return DedupIndexStore._create(
        path, "embedding", {"n_planes": n_planes, "width": width,
                            "n_bands": n_bands})


def create_substring_index(path: str, k: int = 32, w: int = 16
                           ) -> DedupIndexStore:
    """New empty winnowed exact-substring fingerprint index (VERDICT
    r13 item 2 — the strongest-signal dedup modality gets the same
    append-only form as minhash/embedding). ``k`` is the verbatim
    window length in tokens, ``w`` the winnowing window (volume
    ~2/(w+1) of all positions; shared spans >= k + w - 1 are
    guaranteed to collide) — both pinned: fingerprints under different
    (k, w) are not join-compatible."""
    return DedupIndexStore._create(path, "substring", {"k": k, "w": w})


def open_dedup_index(path: str) -> DedupIndexStore:
    return DedupIndexStore.open(path)


# ---------------------------------------------------------------------------
# Index-backed pair finders (differential-tested against the recompute
# forms in tests/test_dedup_index.py)
# ---------------------------------------------------------------------------

def _check_candidate_coverage(pairs: DataFrame, seen: DataFrame,
                              id_col: str) -> None:
    """Raise when a candidate seen-side id has no row in the caller's
    seen frame — such candidates vanish at the verify inner join and
    near-dups are silently ADMITTED (ADVICE r13). One small action
    over candidate ids only; opt-in via ``check_coverage``."""
    missing = (pairs.select(F.col("doc_b").alias(id_col)).distinct()
               .join(seen.select(id_col), id_col, "left_anti")
               .limit(5).collect())
    if missing:
        raise ValueError(
            "seen frame does not cover indexed candidate ids "
            f"{sorted(r[0] for r in missing)}... — candidates for "
            "uncovered docs would vanish at the verify join and "
            "near-dups would be silently admitted. The seen frame "
            "must cover every doc whose rows are in the index "
            "(the streaming maintenance loop guarantees this via the "
            "manifest's corpus_batches).")


def dedup_pairs_cross_indexed(new_docs: DataFrame, seen_docs: DataFrame,
                              seen_index: DataFrame,
                              check_coverage: bool = False) -> DataFrame:
    """:func:`~.dedup.dedup_pairs_cross` with the seen side's band
    frame read from the index instead of re-derived from raw text.
    ``seen_docs`` is touched only to re-attach shingles for CANDIDATE
    ids (explicit semi-join BEFORE the shingle projection — history is
    never re-shingled wholesale).

    CONTRACT (ADVICE r13): ``seen_docs`` must cover every doc_id whose
    rows are in ``seen_index`` — candidates whose raw text is missing
    vanish at the verify join, silently ADMITTING near-dups. The
    maintenance loop satisfies this by reading the manifest's
    corpus_batches; standalone callers can pass
    ``check_coverage=True`` to pay one candidate-ids-only action that
    raises on uncovered ids."""
    sh_n, b_n = _minhash_band_frame(new_docs)
    pairs = (b_n.alias("a")
             .join(seen_index.alias("b"),
                   (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_val") == F.col("b.band_val")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    if check_coverage:
        _check_candidate_coverage(pairs, seen_docs, "doc_id")
    ids_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    sh_s = (seen_docs.join(ids_b, "doc_id", "left_semi")
            .select("doc_id", _shingles(F.col("text")).alias("shingles")))
    return _verify_jaccard(pairs, sh_n, sh_s)


def embedding_pairs_cross_indexed(new_emb: DataFrame,
                                  seen_emb: DataFrame,
                                  seen_index: DataFrame,
                                  n_bands: int, band_bits: int,
                                  tau: float = 0.9,
                                  width: int | None = None,
                                  check_coverage: bool = False
                                  ) -> DataFrame:
    """:func:`~.dedup.embedding_pairs_cross_banded` with the seen
    side's (band_idx, bucket, nrm) read from the index. ``seen_emb``
    supplies embedding arrays for CANDIDATE ids only (the cosine
    verify); the band geometry must be the index's pinned one —
    callers should go through
    :func:`embedding_incremental_survivors_indexed`, which enforces
    it. Ids-only through the band join: the new batch's arrays attach
    AFTER the per-pair dropDuplicates.

    Same coverage CONTRACT as :func:`dedup_pairs_cross_indexed`:
    ``seen_emb`` must cover every indexed vec_id (``check_coverage``
    opts into the loud candidate-only check)."""
    bands_a = banded_signature_rows(new_emb, n_bands, band_bits,
                                    width=width)
    pairs = (bands_a.alias("a")
             .join(seen_index.alias("b"),
                   (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.bucket") == F.col("b.bucket")))
             .select(F.col("a.vec_id").alias("doc_a"),
                     F.col("b.vec_id").alias("doc_b"),
                     F.col("b.nrm").alias("nrm_b"))
             .dropDuplicates(["doc_a", "doc_b"]))
    if check_coverage:
        _check_candidate_coverage(pairs, seen_emb, "vec_id")
    new_feats = new_emb.select(
        F.col("vec_id").alias("doc_a"),
        F.col("embedding").alias("emb_a"),
        F.sqrt(F.expr(_SPARK_DOT.format(a="embedding", b="embedding")))
        .alias("nrm_a"))
    seen_vecs = seen_emb.select(F.col("vec_id").alias("doc_b"),
                                F.col("embedding").alias("emb_b"))
    dot = F.expr(_SPARK_DOT.format(a="emb_a", b="emb_b"))
    return (pairs.join(new_feats, "doc_a").join(seen_vecs, "doc_b")
            .select("doc_a", "doc_b",
                    (dot / (F.col("nrm_a") * F.col("nrm_b")))
                    .alias("cosine"))
            .filter(F.col("cosine") >= tau))


# ---------------------------------------------------------------------------
# Index-backed incremental steps (probe index -> drop hits -> resolve
# within batch -> append survivors' index rows)
# ---------------------------------------------------------------------------

def dedup_incremental_survivors_indexed(store: DedupIndexStore,
                                        new_docs: DataFrame,
                                        seen_docs: DataFrame,
                                        commit: bool = True) -> DataFrame:
    """Index-backed :func:`~.dedup.dedup_incremental_survivors`: drop
    new docs that near-dup the indexed corpus, resolve duplicates
    within the remainder, and (``commit=True``) append the survivors'
    band rows so the NEXT batch probes them too. Returns surviving
    rows (materialized via localCheckpoint when committing, so the
    caller's frame does not recompute the whole step).

    ``seen_docs`` must cover every doc_id in the index (the
    :func:`dedup_pairs_cross_indexed` coverage contract) — the
    maintenance loop guarantees it via the manifest's
    corpus_batches."""
    # geometry, not just kind (ADVICE r13): the probe signs the NEW
    # batch under the module constants, so an index pinned under
    # different band geometry would equi-join incompatible band_vals
    # and silently return zero candidates — exactly the silent-zero-
    # recall failure the manifest guard exists to make loud.
    store._require("minhash", n_hashes=N_HASHES, n_bands=N_BANDS,
                   rows_per_band=ROWS_PER_BAND)
    spark = new_docs.sparkSession
    hit = (dedup_pairs_cross_indexed(new_docs, seen_docs,
                                     store.load(spark))
           .select(F.col("doc_a").alias("doc_id")).distinct())
    fresh = new_docs.join(hit, "doc_id", "left_anti")
    surv = dedup_survivors(
        fresh, connected_components(_minhash_verified_pairs(fresh)))
    if commit:
        surv = surv.localCheckpoint()
        store.append(minhash_index_rows(surv))
    return surv


def embedding_incremental_survivors_indexed(store: DedupIndexStore,
                                            new_emb: DataFrame,
                                            seen_emb: DataFrame,
                                            tau: float = 0.9,
                                            within_bands: int = 4,
                                            commit: bool = True
                                            ) -> DataFrame:
    """Index-backed :func:`~.dedup.embedding_incremental_survivors`;
    the band geometry and width come from the store's manifest (the
    signatures must match the indexed ones — geometry cannot drift by
    construction). The cross probe is multi-band (ADVICE r13), like
    the within-batch batch-scaled multi-band resolve. ``seen_emb``
    must cover every vec_id in the index (the
    :func:`embedding_pairs_cross_indexed` coverage contract) — the
    maintenance loop guarantees it via the manifest's
    corpus_batches."""
    from .dedup import (banded_cosine_pairs, embedding_width_census,
                        scaled_n_planes)

    store._require("embedding")
    n_planes = store.params["n_planes"]
    n_bands = store.params.get("n_bands", 1)
    width = store.params.get("width")
    spark = new_emb.sparkSession
    hit = (embedding_pairs_cross_indexed(new_emb, seen_emb,
                                         store.load(spark),
                                         n_bands, n_planes,
                                         tau=tau, width=width)
           .select(F.col("doc_a").alias("vec_id")).distinct())
    fresh = new_emb.join(hit, "vec_id", "left_anti")
    batch_bits = scaled_n_planes(
        sum(embedding_width_census(new_emb).values()), floor=4)
    within = (banded_cosine_pairs(fresh, n_bands=within_bands,
                                  band_bits=batch_bits, limit=None)
              .filter(F.col("cosine") >= tau)
              .select("doc_a", "doc_b"))
    memb = connected_components(within)
    surv = (fresh.join(memb.select(F.col("doc_id").alias("vec_id"),
                                   "cluster_id"),
                       "vec_id", "left")
            .filter(F.col("cluster_id").isNull()
                    | (F.col("vec_id") == F.col("cluster_id")))
            .drop("cluster_id"))
    if commit:
        surv = surv.localCheckpoint()
        store.append(embedding_index_rows(surv, n_bands, n_planes,
                                          width=width))
    return surv


def substring_pairs_cross_indexed(new_docs: DataFrame,
                                  seen_index: DataFrame,
                                  k: int = 32, w: int = 16,
                                  max_docs_per_window: int = 64
                                  ) -> DataFrame:
    """:func:`~.dedup.substring_pairs_cross` with the seen side's
    fingerprints read from the index — (doc_a=new, doc_b=seen,
    n_shared_fps). No seen raw text is touched at all: a fingerprint
    match already implies a shared exact k-token window. Stop-window
    cut on the combined (new + indexed) per-fingerprint population."""
    fp_n = (_substring_fp_exploded(new_docs, k, w)
            .filter(F.col("fp").isNotNull()).select("doc_id", "fp"))
    pop = (fp_n.select("fp").unionByName(seen_index.select("fp"))
           .groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") <= max_docs_per_window).select("fp"))
    return (fp_n.join(pop, "fp").alias("a")
            .join(seen_index.alias("b"), F.col("a.fp") == F.col("b.fp"))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_fps")))


def substring_incremental_survivors_indexed(store: DedupIndexStore,
                                            new_docs: DataFrame,
                                            max_dup_frac: float = 0.5,
                                            commit: bool = True
                                            ) -> DataFrame:
    """Index-backed :func:`~.dedup.substring_incremental_survivors`:
    drop new docs whose duplicated-fingerprint coverage against the
    INDEXED corpus (plus within-batch duplicates) exceeds the
    ceiling, and (``commit=True``) append the survivors' fingerprints
    so the next batch probes them too. The (k, w) geometry comes from
    the manifest — mismatched fingerprints would silently equi-join to
    nothing, so it is never caller-supplied. Unlike the minhash form,
    no ``seen_docs`` parameter exists: the index IS the complete seen
    state (fingerprint equality needs no verify re-attach)."""
    store._require("substring")
    k, w = store.params["k"], store.params["w"]
    spark = new_docs.sparkSession
    seen_fps = store.load(spark).select("fp").distinct()
    surv = _substring_survivors_against(new_docs, seen_fps, k, w,
                                        max_dup_frac)
    if commit:
        surv = surv.localCheckpoint()
        store.append(substring_index_rows(surv, k, w))
    return surv


# ---------------------------------------------------------------------------
# Streaming corpus maintenance: the index + survivors corpus as the
# foreachBatch target of a document stream
# ---------------------------------------------------------------------------

def _check_stream_token(store: DedupIndexStore,
                        stream_token: str | None) -> None:
    """Replay idempotence is keyed on the micro-batch id, and batch
    ids restart at 0 under a NEW checkpoint directory — without this
    guard every early micro-batch of a restarted-with-fresh-checkpoint
    stream would satisfy ``batch_id <= last_stream_batch`` and be
    silently dropped until ids passed the old high-water mark (ADVICE
    r13). The checkpoint dir is recorded in the manifest meta on the
    first commit and a mismatch is a hard error: a checkpoint dir and
    an index are permanently paired."""
    recorded = store.meta.get("stream_token")
    if (stream_token is not None and recorded is not None
            and recorded != stream_token):
        raise ValueError(
            f"dedup index at {store.path!r} is paired with streaming "
            f"checkpoint {recorded!r}; driving it from "
            f"{stream_token!r} would restart micro-batch ids at 0 and "
            "silently drop batches as replays — resume from the "
            "original checkpoint directory (or build a new index)")


def apply_dedup_maintenance_batch(spark: SparkSession, batch_df: DataFrame,
                                  batch_id: int, corpus_path: str,
                                  index_path: str,
                                  compact_every: int | None = None,
                                  stream_token: str | None = None) -> bool:
    """One idempotent maintenance step: dedup ``batch_df`` against the
    indexed corpus, append the survivors to the corpus and their band
    rows to the index. Returns False when ``batch_id`` was already
    committed (crash-replay no-op).

    Commit protocol (single writer): the survivors land in a
    batch-id-named corpus directory first (mode=overwrite, so a replay
    rewrites identical content — the step is deterministic given the
    committed index state), then ONE atomic index-manifest publish
    commits the index rows AND the meta (last committed micro-batch
    id + the corpus-batch list) together. A crash before the publish
    leaves an orphan corpus directory the replay overwrites; a crash
    after it makes the replay a no-op — the corpus reader only ever
    trusts the manifest's corpus-batch list, so it never sees
    survivors whose index rows aren't committed (the state in which a
    replayed batch would self-collide with its own index rows and
    dedup itself to nothing)."""
    store = open_dedup_index(index_path)
    store._require("minhash", n_hashes=N_HASHES, n_bands=N_BANDS,
                   rows_per_band=ROWS_PER_BAND)
    _check_stream_token(store, stream_token)
    if batch_id <= store.meta.get("last_stream_batch", -1):
        return False
    corpus_batches = list(store.meta.get("corpus_batches", []))
    if corpus_batches:
        seen_docs = spark.read.parquet(
            *[_join(corpus_path, b) for b in corpus_batches])
    else:
        seen_docs = spark.createDataFrame([], "doc_id long, text string")
    surv = dedup_incremental_survivors_indexed(
        store, batch_df.select("doc_id", "text"), seen_docs, commit=False)
    surv = surv.localCheckpoint()
    cname = f"batch={batch_id}"
    (surv.write.mode("overwrite").parquet(_join(corpus_path, cname)))
    meta = {"last_stream_batch": batch_id,
            "corpus_batches": corpus_batches + [cname]}
    if stream_token is not None:
        meta["stream_token"] = stream_token
    store.append(minhash_index_rows(surv), meta_update=meta)
    if compact_every and len(store._batches) >= compact_every:
        store.compact(spark)
        compact_maintained_corpus(spark, corpus_path, store)
    return True


def load_maintained_corpus(spark: SparkSession, corpus_path: str,
                           index_path: str,
                           empty_schema: str = "doc_id long, text string",
                           dequantize: bool = False) -> DataFrame:
    """The deduplicated corpus as of the index manifest — only
    manifest-committed corpus batches (orphans from a crashed trigger
    are invisible until their replay commits). ``empty_schema`` is the
    frame shape before the first commit (text default; pass
    ``"vec_id long, embedding array<double>"`` for embedding
    corpora). ``dequantize=True`` returns an int8-stored embedding
    corpus (``quantize_corpus`` loops) as (vec_id, embedding) floats —
    it raises if the manifest says the corpus is NOT quantized, so a
    mis-paired loader fails loudly instead of mis-typing."""
    store = open_dedup_index(index_path)
    batches = store.meta.get("corpus_batches", [])
    if dequantize and not store.meta.get("corpus_quantized"):
        raise ValueError(
            f"corpus at {corpus_path!r} is not committed as quantized "
            "(manifest meta corpus_quantized is falsy) — nothing to "
            "dequantize")
    if not batches:
        if dequantize:
            return spark.createDataFrame(
                [], "vec_id long, embedding array<double>")
        return spark.createDataFrame([], empty_schema)
    out = spark.read.parquet(*[_join(corpus_path, b) for b in batches])
    if dequantize:
        from .similarity import dequantize_embeddings_int8
        out = dequantize_embeddings_int8(out)
    return out


def compact_maintained_corpus(spark: SparkSession, corpus_path: str,
                              store: "DedupIndexStore | str",
                              n_files: int | None = None) -> str:
    """Fold every committed survivors-corpus batch directory into ONE
    and swap ``corpus_batches`` in a single atomic manifest publish —
    the corpus-side twin of :meth:`DedupIndexStore.compact` (VERDICT
    r13 item 1): the maintenance loops append one ``batch=N`` corpus
    dir per trigger, and both the per-trigger ``seen_docs`` read and
    :func:`load_maintained_corpus` union the full list, so at
    per-trigger cadence the read degrades exactly like the index's
    measured small-files shape — worse, because corpus rows are WIDE
    (full text), so min-file-size row groups waste more.

    Same crash-safety recipe as the index compact: the compacted
    directory lands first, the manifest swap publishes it; a crash in
    between leaves the old manifest (and every old dir) fully intact,
    and the rewrite is deterministic so a redo overwrites the same
    directory. Superseded dirs stay on disk for readers holding the
    pre-compaction manifest (retention is the owner's separate
    decision). Compacted dirs are named ``compact=K`` with a monotonic
    K carried in the manifest meta — they can never collide with the
    ``batch=<micro-batch id>`` trigger dirs.

    ``store`` may be an open :class:`DedupIndexStore` (the maintenance
    loop's in-hand instance) or the index path."""
    if isinstance(store, str):
        store = open_dedup_index(store)
    return _compact_meta_dirs(spark, corpus_path, store,
                              "corpus_batches", "corpus_compact_seq",
                              n_files)


def _compact_meta_dirs(spark: SparkSession, base_path: str,
                       store: DedupIndexStore, list_key: str,
                       seq_key: str,
                       n_files: int | None = None) -> str:
    """Shared compactor for any manifest-meta-listed directory family
    (the survivors corpus, the composed loop's fingerprint dirs): fold
    every listed dir into one ``compact=K`` dir and swap the list in
    ONE atomic manifest publish. Same crash recipe as the index
    compact — data first, manifest second, superseded dirs left for
    pre-compaction readers; K is monotonic per family via ``seq_key``."""
    batches = list(store.meta.get(list_key, []))
    if len(batches) <= 1:
        return ""
    whole = spark.read.parquet(*[_join(base_path, b) for b in batches])
    if n_files is None:
        n_files = max(1, min(len(batches),
                             spark.sparkContext.defaultParallelism))
    seq = int(store.meta.get(seq_key, -1)) + 1
    name = f"compact={seq}"
    (whole.repartition(n_files).write.mode("overwrite")
     .parquet(_join(base_path, name)))
    store.meta[list_key] = [name]
    store.meta[seq_key] = seq
    store._write_manifest()
    return name


def start_dedup_maintenance_stream(docs_stream: DataFrame,
                                   corpus_path: str, index_path: str,
                                   checkpoint_dir: str,
                                   compact_every: int | None = None,
                                   available_now: bool = False,
                                   processing_time: str = "10 seconds"):
    """Streaming corpus maintenance: each micro-batch of (doc_id,
    text) documents is deduplicated against everything committed so
    far (:func:`apply_dedup_maintenance_batch`) — the index answers
    "have I seen a near-dup?" without re-hashing history, survivors
    append to both stores, and the index optionally compacts when its
    batch-dir count reaches ``compact_every``. foreachBatch for the
    same reason as the lake enrichment stream: the step is an exact
    bounded-frame operator per trigger; idempotent replay makes it
    exactly-once end to end (the checkpoint replays a failed trigger,
    the manifest meta makes the replay a committed-batch no-op). The
    checkpoint directory is recorded in the manifest on first commit
    and pinned thereafter: driving a committed index from a DIFFERENT
    checkpoint (whose micro-batch ids restart at 0) is a hard error,
    not a silent replay-drop (ADVICE r13)."""
    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        apply_dedup_maintenance_batch(
            batch_df.sparkSession, batch_df, batch_id,
            corpus_path, index_path, compact_every,
            stream_token=checkpoint_dir)

    writer = (docs_stream.writeStream.foreachBatch(_proc)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def apply_substring_maintenance_batch(spark: SparkSession,
                                      batch_df: DataFrame, batch_id: int,
                                      corpus_path: str, index_path: str,
                                      max_dup_frac: float = 0.5,
                                      compact_every: int | None = None,
                                      stream_token: str | None = None
                                      ) -> bool:
    """Exact-substring analog of :func:`apply_dedup_maintenance_batch`
    (VERDICT r13 item 2): per trigger, drop new docs whose verbatim
    duplicated-span (fingerprint) coverage against everything
    committed so far exceeds ``max_dup_frac``, append survivors to the
    corpus and their winnowed fingerprints to the index — the
    composition that lets ``build_training_corpus``'s substring gate
    run append-only instead of batch-wide. Same idempotent commit
    protocol; note the per-trigger step never reads the seen corpus
    (the fingerprint index is the complete seen state), so corpus
    dirs are write-only until :func:`load_maintained_corpus`."""
    store = open_dedup_index(index_path)
    store._require("substring")
    _check_stream_token(store, stream_token)
    if batch_id <= store.meta.get("last_stream_batch", -1):
        return False
    corpus_batches = list(store.meta.get("corpus_batches", []))
    surv = substring_incremental_survivors_indexed(
        store, batch_df.select("doc_id", "text"),
        max_dup_frac=max_dup_frac, commit=False)
    surv = surv.localCheckpoint()
    cname = f"batch={batch_id}"
    surv.write.mode("overwrite").parquet(_join(corpus_path, cname))
    meta = {"last_stream_batch": batch_id,
            "corpus_batches": corpus_batches + [cname]}
    if stream_token is not None:
        meta["stream_token"] = stream_token
    store.append(substring_index_rows(surv, store.params["k"],
                                      store.params["w"]),
                 meta_update=meta)
    if compact_every and len(store._batches) >= compact_every:
        store.compact(spark)
        compact_maintained_corpus(spark, corpus_path, store)
    return True


def start_substring_maintenance_stream(docs_stream: DataFrame,
                                       corpus_path: str, index_path: str,
                                       checkpoint_dir: str,
                                       max_dup_frac: float = 0.5,
                                       compact_every: int | None = None,
                                       available_now: bool = False,
                                       processing_time: str = "10 seconds"):
    """Streaming exact-substring corpus maintenance — see
    :func:`start_dedup_maintenance_stream` for the commit/replay/
    checkpoint-pairing contract; the drop criterion here is winnowed
    verbatim-span coverage > ``max_dup_frac`` against the committed
    fingerprint index."""
    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        apply_substring_maintenance_batch(
            batch_df.sparkSession, batch_df, batch_id,
            corpus_path, index_path, max_dup_frac, compact_every,
            stream_token=checkpoint_dir)

    writer = (docs_stream.writeStream.foreachBatch(_proc)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def apply_curation_maintenance_batch(spark: SparkSession,
                                     batch_df: DataFrame, batch_id: int,
                                     corpus_path: str, index_path: str,
                                     fp_path: str,
                                     max_dup_frac: float = 0.5,
                                     k: int = 32, w: int = 16,
                                     compact_every: int | None = None,
                                     stream_token: str | None = None
                                     ) -> bool:
    """COMPOSED per-trigger curation (r14): the exact-substring
    coverage gate THEN MinHash near-dup dedup, both against committed
    state, with ONE commit point — the ``build_training_corpus``
    cross-document stage order, append-only.

    Why this cannot be two maintenance loops chained: each loop's
    store is its own commit authority, so a crash between the
    substring commit and the minhash commit leaves the trigger
    half-committed — and on replay the substring stage would probe an
    index that already contains the batch's OWN fingerprints and
    dedup it against itself to nothing. Here the MINHASH manifest is
    the single authority: the substring fingerprints live in plain
    ``fp_path`` directories whose committed list rides that manifest's
    meta (``fp_batches``), so corpus dir + fingerprint dir land first
    and ONE atomic publish commits rows + both directory lists + the
    replay high-water mark together. A crash anywhere before the
    publish leaves only invisible orphans the replay overwrites.

    The substring geometry (``k``, ``w``) is recorded in the manifest
    meta on first commit and validated thereafter (mismatched
    fingerprints equi-join to silent zero recall — same reason the
    index kinds pin their params)."""
    store = open_dedup_index(index_path)
    store._require("minhash", n_hashes=N_HASHES, n_bands=N_BANDS,
                   rows_per_band=ROWS_PER_BAND)
    _check_stream_token(store, stream_token)
    rec_k = store.meta.get("substring_k")
    rec_w = store.meta.get("substring_w")
    if rec_k is not None and (rec_k, rec_w) != (k, w):
        raise ValueError(
            f"curation loop at {index_path!r} committed fingerprints "
            f"under (k={rec_k}, w={rec_w}); probing with (k={k}, "
            f"w={w}) would silently match nothing")
    if batch_id <= store.meta.get("last_stream_batch", -1):
        return False
    corpus_batches = list(store.meta.get("corpus_batches", []))
    fp_batches = list(store.meta.get("fp_batches", []))
    if corpus_batches:
        seen_docs = spark.read.parquet(
            *[_join(corpus_path, b) for b in corpus_batches])
    else:
        seen_docs = spark.createDataFrame([], "doc_id long, text string")
    if fp_batches:
        seen_fps = (spark.read.parquet(
            *[_join(fp_path, b) for b in fp_batches])
            .select("fp").distinct())
    else:
        seen_fps = spark.createDataFrame([], "fp long")

    batch = batch_df.select("doc_id", "text")
    s1 = _substring_survivors_against(batch, seen_fps, k, w,
                                      max_dup_frac)
    surv = dedup_incremental_survivors_indexed(
        store, s1, seen_docs, commit=False)
    surv = surv.localCheckpoint()
    cname = f"batch={batch_id}"
    surv.write.mode("overwrite").parquet(_join(corpus_path, cname))
    (substring_index_rows(surv, k, w)
     .write.mode("overwrite").parquet(_join(fp_path, cname)))
    meta = {"last_stream_batch": batch_id,
            "corpus_batches": corpus_batches + [cname],
            "fp_batches": fp_batches + [cname],
            "substring_k": k, "substring_w": w}
    if stream_token is not None:
        meta["stream_token"] = stream_token
    store.append(minhash_index_rows(surv), meta_update=meta)
    if compact_every and len(store._batches) >= compact_every:
        store.compact(spark)
        compact_maintained_corpus(spark, corpus_path, store)
        _compact_meta_dirs(spark, fp_path, store, "fp_batches",
                           "fp_compact_seq")
    return True


def start_curation_maintenance_stream(docs_stream: DataFrame,
                                      corpus_path: str, index_path: str,
                                      fp_path: str,
                                      checkpoint_dir: str,
                                      max_dup_frac: float = 0.5,
                                      k: int = 32, w: int = 16,
                                      compact_every: int | None = None,
                                      available_now: bool = False,
                                      processing_time: str = "10 seconds"):
    """Streaming composed curation (substring gate -> MinHash dedup
    per trigger, one commit point) — see
    :func:`apply_curation_maintenance_batch` for the single-authority
    commit protocol and :func:`start_dedup_maintenance_stream` for the
    checkpoint-pairing contract."""
    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        apply_curation_maintenance_batch(
            batch_df.sparkSession, batch_df, batch_id,
            corpus_path, index_path, fp_path, max_dup_frac, k, w,
            compact_every, stream_token=checkpoint_dir)

    writer = (docs_stream.writeStream.foreachBatch(_proc)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def apply_embedding_maintenance_batch(spark: SparkSession,
                                      batch_df: DataFrame, batch_id: int,
                                      corpus_path: str, index_path: str,
                                      tau: float = 0.9,
                                      compact_every: int | None = None,
                                      stream_token: str | None = None,
                                      quantize_corpus: bool = False
                                      ) -> bool:
    """Embedding analog of :func:`apply_dedup_maintenance_batch` —
    same idempotent commit protocol (batch-id corpus dir overwrite,
    then ONE atomic manifest publish of index rows + meta); the
    per-batch step is :func:`embedding_incremental_survivors_indexed`
    (banded bucket probe against the index, batch-scaled multi-band
    within-batch resolve).

    ``quantize_corpus=True`` stores the survivors corpus in the int8
    form (``similarity.quantize_embeddings_int8`` — (vec_id, scale, q),
    ~8x smaller than float64 arrays): at 100 TB the maintained corpus
    IS the dominant storage and the verify step only needs candidate
    vectors to ~1/254 relative precision (dequantized on read, one
    narrow projection). The flag is pinned in the manifest meta on
    first commit — a loop restarted with the other setting is a loud
    error, never a mis-typed read. The INDEX rows (signatures + norms)
    are always computed from the incoming full-precision batch."""
    from .similarity import (dequantize_embeddings_int8,
                             quantize_embeddings_int8)

    store = open_dedup_index(index_path)
    store._require("embedding")
    _check_stream_token(store, stream_token)
    recorded_q = store.meta.get("corpus_quantized")
    if recorded_q is not None and bool(quantize_corpus) != recorded_q:
        raise ValueError(
            f"embedding corpus at {corpus_path!r} is committed with "
            f"corpus_quantized={recorded_q}; driving the loop with "
            f"quantize_corpus={bool(quantize_corpus)} would mix int8 "
            "and float batch schemas in one manifest")
    if batch_id <= store.meta.get("last_stream_batch", -1):
        return False
    corpus_batches = list(store.meta.get("corpus_batches", []))
    if corpus_batches:
        seen_emb = spark.read.parquet(
            *[_join(corpus_path, b) for b in corpus_batches])
        if quantize_corpus:
            seen_emb = dequantize_embeddings_int8(seen_emb)
    else:
        seen_emb = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
    surv = embedding_incremental_survivors_indexed(
        store, batch_df.select("vec_id", "embedding"), seen_emb,
        tau=tau, commit=False)
    surv = surv.localCheckpoint()
    cname = f"batch={batch_id}"
    out = quantize_embeddings_int8(surv) if quantize_corpus else surv
    out.write.mode("overwrite").parquet(_join(corpus_path, cname))
    meta = {"last_stream_batch": batch_id,
            "corpus_batches": corpus_batches + [cname],
            "corpus_quantized": bool(quantize_corpus)}
    if stream_token is not None:
        meta["stream_token"] = stream_token
    store.append(
        embedding_index_rows(surv, store.params.get("n_bands", 1),
                             store.params["n_planes"],
                             width=store.params.get("width")),
        meta_update=meta)
    if compact_every and len(store._batches) >= compact_every:
        store.compact(spark)
        compact_maintained_corpus(spark, corpus_path, store)
    return True


def start_embedding_maintenance_stream(emb_stream: DataFrame,
                                       corpus_path: str, index_path: str,
                                       checkpoint_dir: str,
                                       tau: float = 0.9,
                                       compact_every: int | None = None,
                                       available_now: bool = False,
                                       processing_time: str = "10 seconds",
                                       quantize_corpus: bool = False):
    """Streaming embedding-corpus maintenance — see
    :func:`start_dedup_maintenance_stream` for the commit/replay
    contract; the dedup criterion here is cosine >= ``tau`` against
    the banded LSH-bucket index. ``quantize_corpus`` stores the
    survivors tier int8 (8x smaller; see
    :func:`apply_embedding_maintenance_batch`)."""
    def _proc(batch_df: DataFrame, batch_id: int) -> None:
        apply_embedding_maintenance_batch(
            batch_df.sparkSession, batch_df, batch_id,
            corpus_path, index_path, tau, compact_every,
            stream_token=checkpoint_dir,
            quantize_corpus=quantize_corpus)

    writer = (emb_stream.writeStream.foreachBatch(_proc)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
