"""Plan-construction time audit (r14): Catalyst planning cost is part
of the serving budget, and two traps this repo hit make it blow up
silently — interpreted-eval re-evaluation (r13, execution-side) and
alias-inlining explosion over staged projection chains (r14,
PLAN-side: size(chain) beside explode(chain) put 145 s into
AliasHelper.trimAliases before a row was read). Execution regressions
show up in bench.py; plan-time regressions previously had no gate.

Gate: every catalog query must finish ANALYSIS + OPTIMIZATION +
physical planning within a generous steal-safe budget. Typical healthy
plans take well under a second; the r14 trap exceeded the budget by
~5x at sf-independent cost (planning does not read data, so sf0.001
inputs exercise the same plan shapes the 100 TB deployment would)."""

from __future__ import annotations

import time

import pytest

from solana_event_stream_spark.catalog import load_catalog

CATALOG = load_catalog()
PLAN_BUDGET_S = 30.0


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_query_plans_within_budget(spark, sf_dir, name):
    t0 = time.perf_counter()
    df = CATALOG[name].spark_fn(spark, sf_dir)
    df._jdf.queryExecution().executedPlan()
    took = time.perf_counter() - t0
    assert took < PLAN_BUDGET_S, (
        f"{name} spent {took:.1f} s in plan construction — "
        "staged-chain alias blowup or a new planner pathology")
