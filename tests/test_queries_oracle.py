"""Mirror of the driver's t2 gate: every catalog query with an oracle must
match DuckDB exactly (values, columns, row count) at sf0.001."""

from __future__ import annotations

import pytest

from solana_event_stream_spark.catalog import load_catalog
from solana_event_stream_spark.testing import compare_to_oracle

CATALOG = load_catalog()
ORACLE_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    problems = compare_to_oracle(spark, name, CATALOG[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert df.schema is not None
    assert len(rows) >= 0


def test_queries_oracle_keys_align():
    import __spark_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
