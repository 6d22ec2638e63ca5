"""Golden test: the event pipeline must reproduce events_golden.parquet
from raw_transactions.parquet exactly (every column, every row)."""

from __future__ import annotations

import json
import math
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")

ORDER = ["slot", "transaction_index", "outer_index", "inner_index",
         "event_type"]


def _norm(v):
    import numpy as np
    import pandas as pd
    from decimal import Decimal
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, _norm(x)) for k, x in sorted(v.items()))
    if hasattr(v, "asDict"):  # pyspark Row
        return _norm(v.asDict())
    if isinstance(v, Decimal):
        return int(v)
    if v is None or pd.isna(v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


@pytest.fixture(scope="module")
def results(spark):
    from solana_event_stream_spark.plans.pipeline import (build_events,
                                                          load_raw_transactions)
    with open(os.path.join(FIXTURES, "meta.json")) as f:
        meta = json.load(f)
    raw = load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet"))
    got = build_events(raw, bot_wallet=meta["bot_wallet"]).toPandas()
    exp = spark.read.parquet(
        os.path.join(FIXTURES, "events_golden.parquet")).toPandas()
    return got, exp


def _key(row):
    return tuple((x is None, x if x is not None else 0) for x in row)


def _sorted_rows(pdf, cols):
    rows = [tuple(_norm(v) for v in rec)
            for rec in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: str(r))


def test_row_count(results):
    got, exp = results
    assert len(got) == len(exp), (
        f"got {len(got)} events, expected {len(exp)}: "
        f"{sorted(got['event_type'])} vs {sorted(exp['event_type'])}")


def test_columns_match(results):
    got, exp = results
    assert sorted(got.columns) == sorted(exp.columns)


def test_values_match(results):
    got, exp = results
    cols = sorted(exp.columns)
    grows = _sorted_rows(got, cols)
    erows = _sorted_rows(exp, cols)
    n_bad = 0
    for i, (g, e) in enumerate(zip(grows, erows)):
        for c, gv, ev in zip(cols, g, e):
            if gv != ev:
                n_bad += 1
                if n_bad <= 10:
                    print(f"row {i} col {c}: got {gv!r} expected {ev!r}")
    assert n_bad == 0, f"{n_bad} mismatched cells"
