"""Guards on the mapInArrow decode boundary itself: batch shapes the
golden corpus never produces (all rows skipped, empty batch, split
batches) must still yield schema-correct RecordBatches — a malformed
output schema would fail every downstream query at once."""

from __future__ import annotations

import os

import pyarrow as pa

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _input_batch(spark):
    from solana_event_stream_spark.plans.pipeline import (
        build_decode_input, load_raw_transactions)
    din = build_decode_input(load_raw_transactions(
        spark, os.path.join(FIXTURES, "raw_transactions.parquet")))
    # Public df.toArrow() (Spark 4.0+) — same Spark->Arrow schema
    # conversion the mapInArrow input path uses, without depending on
    # the private _collect_as_arrow API.
    tbl = din.toArrow().combine_chunks()
    return tbl.to_batches()[0]


def test_decode_output_schema_is_exact(spark):
    from solana_event_stream_spark.plans.pipeline import (
        _arrow_event_schema, _decode_batches)
    batch = _input_batch(spark)
    out = list(_decode_batches(iter([batch]), None))
    assert len(out) == 1
    assert out[0].schema.equals(_arrow_event_schema())
    assert out[0].num_rows > 0


def test_decode_all_rows_skipped_yields_empty_batch(spark):
    from solana_event_stream_spark.plans.pipeline import (
        _arrow_event_schema, _decode_batches)
    batch = _input_batch(spark)
    n = batch.num_rows
    cols = {nm: batch.column(i) for i, nm in enumerate(batch.schema.names)}
    # Common protocol + empty data: every row fails the ComputeBudget
    # decode and is dropped
    cols["protocol"] = pa.array(["Common"] * n, pa.string())
    cols["data"] = pa.array([b""] * n, batch.schema.field("data").type)
    bad = pa.RecordBatch.from_arrays(
        [cols[nm] for nm in batch.schema.names], schema=batch.schema)
    out = list(_decode_batches(iter([bad]), None))
    assert out[0].num_rows == 0
    assert out[0].schema.equals(_arrow_event_schema())


def test_decode_split_batches_equal_one_batch(spark):
    from solana_event_stream_spark.plans.pipeline import _decode_batches
    batch = _input_batch(spark)
    whole = pa.Table.from_batches(list(_decode_batches(iter([batch]), None)))
    mid = batch.num_rows // 2
    halves = [batch.slice(0, mid), batch.slice(mid)]
    split = pa.Table.from_batches(list(_decode_batches(iter(halves), None)))
    assert whole.num_rows == split.num_rows
    # row-level equality after a deterministic sort
    a = whole.to_pandas().sort_values(
        ["signature", "outer_index", "inner_index", "event_type"],
        na_position="first").reset_index(drop=True)
    b = split.to_pandas().sort_values(
        ["signature", "outer_index", "inner_index", "event_type"],
        na_position="first").reset_index(drop=True)
    assert a.equals(b)
