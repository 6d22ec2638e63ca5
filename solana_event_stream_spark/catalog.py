"""Central query catalog.

Every operator/query the engine claims (SURVEY.md §2 + the LLM-data-
pipeline extensions) registers here as a :class:`QuerySpec`:

- ``spark_fn(spark, sf_dir) -> DataFrame`` -- the engine's implementation
  (DataFrame API, Catalyst-optimized).
- ``oracle`` -- equivalent ANSI SQL for the DuckDB oracle (None for ops
  that are not SQL-expressible; the driver then records a rows-only check).

``__spark_entry__.py`` and ``bench.py`` are thin shims over this catalog.

Determinism contract (hash-match with the oracle):
- per-row arithmetic stays in DOUBLE (IEEE ops are bitwise deterministic
  across engines);
- aggregations of non-integer doubles go through
  ``CAST(... AS DECIMAL(28,10))`` so the sum is exact and
  order-independent, then the result is cast back to DOUBLE;
- every top-k has a total-order tie-break;
- all computed columns are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = True  # include in bench.py headline set


CATALOG: dict[str, QuerySpec] = {}

# --- tracked persists (ADVICE r10) -----------------------------------------
# Operators that persist() an intermediate (embedding_curation's
# assignment frame, events_time_rollup's 5-min partials) register it
# here; the NEXT top-level catalog invocation releases the previous
# query's caches, so repeated catalog/bench runs in one session no
# longer accumulate partitions in executor storage memory. Release is
# deferred to the next query (not this one's return) because the cache
# must outlive the caller's collect(); unpersisting a frame is always
# correctness-safe — a still-referenced plan just recomputes.
#
# Thread model (ADVICE r11 + r12): persists are tracked PER THREAD —
# a thread's top-level catalog entry drains only the frames that
# thread's earlier queries enrolled, so concurrent catalog queries on
# separate threads genuinely never release each other's live caches
# mid-query (the r11 form only lock-guarded the list mutation; any
# thread's entry still drained the single global list, rendering
# another thread's persist ineffective under concurrency — recompute-
# safe, but not what the comment claimed). A global registry remains
# for teardown: ``release_persisted()`` drains EVERY thread's frames.
# Long-lived sessions that stop issuing catalog queries should call it
# at teardown — nothing else drops the last query's caches.

import threading as _threading

_PERSIST_LOCK = _threading.Lock()
_ALL_PERSISTS: dict[int, DataFrame] = {}   # id(df) -> df, every thread
_LOCAL = _threading.local()                # .frames: this thread's list


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + enrollment for release at the calling
    thread's next top-level catalog entry (or global
    :func:`release_persisted`)."""
    df.persist()
    frames = getattr(_LOCAL, "frames", None)
    if frames is None:
        frames = _LOCAL.frames = []
    frames.append(df)
    with _PERSIST_LOCK:
        _ALL_PERSISTS[id(df)] = df
    return df


def _unpersist_all(frames) -> int:
    n = 0
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
        n += 1
    return n


def _release_thread_persists() -> int:
    """Unpersist the frames enrolled by THIS thread's earlier queries."""
    frames = getattr(_LOCAL, "frames", None)
    if not frames:
        return 0
    drained, frames[:] = frames[:], []
    with _PERSIST_LOCK:
        for df in drained:
            _ALL_PERSISTS.pop(id(df), None)
    return _unpersist_all(drained)


def release_persisted() -> int:
    """Unpersist every tracked frame ACROSS threads; returns how many
    were released. Call at session teardown if the session will
    outlive its last catalog query — per-thread release is otherwise
    deferred to that thread's next top-level query. (A thread-local
    list may briefly retain a reference to a frame drained here;
    unpersisting twice is a no-op, so that is harmless.)"""
    with _PERSIST_LOCK:
        drained = list(_ALL_PERSISTS.values())
        _ALL_PERSISTS.clear()
    frames = getattr(_LOCAL, "frames", None)
    if frames:
        frames[:] = []
    return _unpersist_all(drained)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             doc: str = "", bench: bool = True):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` in the catalog.

    The registered callable releases the PREVIOUS query's tracked
    persists on entry (top-level invocations only — a battery that
    composes other registered queries must not drop its own caches
    mid-build)."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            depth = getattr(_LOCAL, "depth", 0)
            if depth == 0:
                _release_thread_persists()
            _LOCAL.depth = depth + 1
            try:
                return fn(spark, sf_dir)
            finally:
                _LOCAL.depth = depth

        CATALOG[name] = QuerySpec(name=name, spark_fn=wrapped, oracle=oracle,
                                  tags=tags, doc=doc or (fn.__doc__ or ""),
                                  bench=bench)
        return fn
    return deco


_LOADED = False


def load_catalog() -> dict[str, QuerySpec]:
    """Import all query-providing modules (idempotent) and return CATALOG."""
    global _LOADED
    if not _LOADED:
        from .plans import analytics  # noqa: F401
        from .plans import events_analytics  # noqa: F401
        from .plans import pipeline_queries  # noqa: F401
        from .operators import curation  # noqa: F401
        from .operators import dedup  # noqa: F401
        from .operators import multimodal  # noqa: F401
        from .operators import similarity  # noqa: F401
        from .operators import temporal  # noqa: F401
        from .operators import text_analysis  # noqa: F401
        from .operators import training_data  # noqa: F401
        _LOADED = True
    return CATALOG
