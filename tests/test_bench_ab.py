"""bench.py interleaved A/B mode: the baseline checkout's catalog must
load under the renamed package and its Python-worker stages must
actually execute (the addPyFile shipping is what makes mapInPandas
queries unpicklable-proof on workers)."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_baseline_catalog_loads_renamed_and_runs_on_workers(spark, sf_dir):
    from bench import _load_baseline_catalog
    from solana_event_stream_spark.catalog import load_catalog

    # "baseline" = this very checkout: the machinery is what's under test
    base = _load_baseline_catalog(spark, REPO)
    cur = load_catalog()
    assert set(base) == set(cur)
    # the renamed package is genuinely independent of the current one
    fn = base["multimodal_metadata_extract"].spark_fn
    assert fn.__module__.startswith("ses_baseline.")
    # and its mapInPandas stage executes on Python workers (this is the
    # part a driver-only sys.path insert breaks)
    assert fn(spark, sf_dir).count() > 0
