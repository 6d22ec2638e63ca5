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


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             doc: str = "", bench: bool = True):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` in the catalog."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle,
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
