"""Golden test for the account-update pipeline (D3/P8)."""

from __future__ import annotations

import os

from test_pipeline_golden import _sorted_rows

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def test_account_events_match_golden(spark):
    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)
    raw = load_raw_accounts(
        spark, os.path.join(FIXTURES, "raw_accounts.parquet"))
    got = build_account_events(raw).toPandas()
    exp = spark.read.parquet(
        os.path.join(FIXTURES, "accounts_golden.parquet")).toPandas()
    assert len(got) == len(exp)
    assert sorted(got.columns) == sorted(exp.columns)
    cols = sorted(exp.columns)
    grows, erows = _sorted_rows(got, cols), _sorted_rows(exp, cols)
    n_bad = 0
    for i, (g, e) in enumerate(zip(grows, erows)):
        for c, gv, ev in zip(cols, g, e):
            if gv != ev:
                n_bad += 1
                if n_bad <= 8:
                    print(f"row {i} col {c}: got {gv!r} expected {ev!r}")
    assert n_bad == 0
