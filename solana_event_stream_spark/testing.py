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

try:
    import pandas as _pd
    _NAT = _pd.NaT
except ImportError:  # pragma: no cover
    _NAT = object()


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
    """Dtype-strict cell normalization.

    The driver's t2 harness hashes the raw pandas values, so a Spark
    ``Decimal``/int64 vs DuckDB float64 difference IS a failure even when
    the numeric values agree.  We therefore keep the value's type visible:
    ``Decimal`` stays ``Decimal``, NaN becomes a distinct sentinel (equal
    to itself, not to None), and numpy scalars fold to their Python
    equivalents (int64 -> int, float64 -> float) exactly as ``itertuples``
    yields them on both engines.
    """
    if v is None:
        return None
    if v is _NAT:
        # NaT == NaT is False (NaN semantics) but both engines yield the
        # same pd.NaT singleton for NULL timestamps — fold to a sentinel.
        return ("nat",)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    # numpy arrays (Spark array<> columns via toPandas) — fold to tuples
    # so cell equality is well-defined (ndarray __eq__ is elementwise)
    if getattr(v, "ndim", 0) >= 1 and hasattr(v, "tolist"):
        return tuple(_norm_cell(x) for x in v.tolist())
    # struct/map cells (dicts under Arrow) — normalize values recursively
    # and fix the key order so equality and sorting are well-defined
    if isinstance(v, dict):
        return ("dict",) + tuple(
            (k, _norm_cell(x)) for k, x in sorted(v.items()))
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
    # Dtype-strict: the driver hashes pandas values, so a Decimal/int64
    # column on one side vs float64 on the other fails even with equal
    # numeric values. Surface that here rather than in CORRECTNESS_r{N}.
    for c in scols:
        sd, od = sdf[c].dtype, odf[c].dtype
        # kind, not full dtype: datetime64[ns] vs [us] hashes the same
        # (pd.Timestamp values compare equal), int64 vs float64 does not.
        if getattr(sd, "kind", "?") != getattr(od, "kind", "?"):
            problems.append(f"dtype col {c}: spark={sd} oracle={od}")
    if problems:
        return problems

    n_bad = 0
    for i, (sr, orr) in enumerate(zip(srows, orows)):
        for c, (sv, ov) in zip(scols, zip(sr, orr)):
            ok = sv == ov
            if not ok and float_rel_tol and _is_float(sv) and _is_float(ov):
                ok = math.isclose(sv[1], ov[1], rel_tol=float_rel_tol,
                                  abs_tol=float_rel_tol)
            if not ok:
                n_bad += 1
                if n_bad <= 5:
                    problems.append(
                        f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems


def _is_float(v) -> bool:
    return (isinstance(v, tuple) and len(v) == 2 and v[0] == "float"
            and isinstance(v[1], float))
