"""Oracle-comparison utilities mirroring the driver's t2 harness.

Runs a catalog query's Spark implementation and its DuckDB oracle SQL on
the same sf dir and compares row count, column-name set, and values
(rows sorted, columns sorted by name) — a local preview of
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

from .tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL in DuckDB with the standard views registered."""
    import duckdb
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            # DuckDB's fetchdf renders NULL decimals as NaN; treat as null
            return None
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(pdf):
    import pandas as pd  # noqa: F401
    cols = sorted(pdf.columns)
    rows = []
    for rec in pdf[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm_cell(v) for v in rec))
    return cols, sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x if not isinstance(x, tuple) else str(x))
        for x in r))


def compare_to_oracle(spark, name: str, spec, sf_dir: str,
                      float_rel_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    odf = run_oracle(spec.oracle, sf_dir)

    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    scols, srows = _norm_rows(sdf)
    ocols, orows = _norm_rows(odf)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
        return problems
    if problems:
        return problems

    n_bad = 0
    for i, (sr, orr) in enumerate(zip(srows, orows)):
        for c, (sv, ov) in zip(scols, zip(sr, orr)):
            ok = sv == ov
            if not ok and float_rel_tol and isinstance(sv, float) \
                    and isinstance(ov, float):
                ok = math.isclose(sv, ov, rel_tol=float_rel_tol,
                                  abs_tol=float_rel_tol)
            if not ok:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(
                        f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems
