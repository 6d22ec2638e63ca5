"""Transport-layer golden tests (S1/S2 mapping without network): the
SubscribeUpdate -> row mapping (grpc/pool.rs:271-291, :96-121, :191-201),
the UpdateOneof demux (yellowstone_grpc.rs:183-275), and the ShredStream
bincode entry decode + explode (shred_stream.rs:52-66) — all driven from
the committed recorded-message fixtures."""

import json
import os

import pytest

from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA
from solana_event_stream_spark.sources.transport import (
    account_update_to_row, blockmeta_update_to_row, decode_entries,
    entries_to_rows, subscribe_update_to_rows, tx_update_to_row)

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                        "transport_messages.json")


def _unhex(obj):
    """Fixture JSON stores bytes hex-encoded; rebuild the dict-shaped
    message the live adapter would hand to the mapping functions."""
    if isinstance(obj, str):
        try:
            return bytes.fromhex(obj) if obj and len(obj) % 2 == 0 else obj
        except ValueError:
            return obj
    if isinstance(obj, list):
        return [_unhex(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _unhex(v) for k, v in obj.items()}
    return obj


@pytest.fixture(scope="module")
def fx():
    with open(FIXTURES) as f:
        raw = json.load(f)
    out = {k: _unhex(v) for k, v in raw.items() if k != "expected"}
    out["expected"] = raw["expected"]
    # keys that must stay strings, not bytes
    out["blockmeta_update"]["blockhash"] = raw["blockmeta_update"]["blockhash"]
    return out


def test_tx_update_mapping(fx):
    row = tx_update_to_row(fx["tx_update"], recv_us=1_000_000)
    exp = fx["expected"]
    assert row["slot"] == 12345
    assert row["transaction_index"] == 3
    assert row["signature"] == exp["tx_signature"]
    assert row["is_vote"] is False
    assert row["recv_us"] == 1_000_000
    assert row["block_time"].timestamp() == pytest.approx(1723500000.5)
    assert row["static_account_keys"] == exp["legacy_keys"]
    assert len(row["loaded_writable_addresses"]) == 1
    assert len(row["loaded_readonly_addresses"]) == 1
    ix = row["instructions"][0]
    assert ix["program_id_index"] == 16
    assert ix["account_indices"] == list(range(16))
    assert ix["data"][:8] == bytes([102, 6, 61, 18, 1, 218, 235, 234])
    grp = row["inner_instructions"][0]
    assert grp["index"] == 0
    assert grp["instructions"][0]["account_indices"] == [0, 1, 2]
    # row is schema-complete for the raw transaction table
    assert set(row) == {f.name for f in RAW_TRANSACTION_SCHEMA.fields}


def test_account_update_mapping(fx):
    row = account_update_to_row(fx["account_update"], recv_us=2_000_000)
    assert row["slot"] == 12346
    assert row["pubkey"] == fx["expected"]["account_pubkey"]
    assert row["lamports"] == 2039280
    assert row["rent_epoch"] == 361
    assert row["executable"] is False
    assert len(row["data"]) == 64


def test_blockmeta_update_mapping(fx):
    row = blockmeta_update_to_row(fx["blockmeta_update"], recv_us=3)
    assert row["slot"] == 12347
    assert row["block_time"].timestamp() == 1723500100
    assert row["block_hash"] == fx["blockmeta_update"]["blockhash"]


def test_demux(fx):
    out = list(subscribe_update_to_rows(fx["tx_update"], 1))
    assert [k for k, _ in out] == ["transaction"]
    out = list(subscribe_update_to_rows(fx["account_update"], 1))
    assert [k for k, _ in out] == ["account"]
    out = list(subscribe_update_to_rows({"ping": {}}, 1))
    assert out == []  # pings are transport-level, no rows


def test_decode_entries(fx):
    entries = decode_entries(fx["shred_entries_payload"])
    exp = fx["expected"]
    assert len(entries) == exp["n_entries"]
    assert entries[0]["num_hashes"] == 5
    legacy = entries[0]["transactions"][0]
    assert legacy["signatures"][0] == exp["tx_signature"]
    assert legacy["message"]["account_keys"] == exp["legacy_keys"]
    assert legacy["message"]["address_table_lookups"] == []
    v0 = entries[1]["transactions"][0]
    lk = v0["message"]["address_table_lookups"][0]
    assert lk["account_key"] == exp["v0_lookup_key"]
    assert lk["writable_indexes"] == [1, 2]
    assert lk["readonly_indexes"] == [3]


def test_decode_entries_truncated():
    with pytest.raises(ValueError):
        decode_entries(bytes.fromhex("0100000000000000ff"))


def test_entries_to_rows_shape(fx):
    rows = list(entries_to_rows(fx["shred_entries_payload"], slot=42,
                                recv_us=9))
    assert len(rows) == 2
    assert [r["transaction_index"] for r in rows] == [0, 1]
    for r in rows:
        assert r["slot"] == 42
        assert r["block_time"] is None          # shreds carry no meta
        assert r["inner_instructions"] == []
        assert r["source"] == "shred"
        assert set(r) == {f.name for f in RAW_TRANSACTION_SCHEMA.fields}


def test_shred_rows_through_pipeline(fx, spark):
    """End-to-end: recorded shred payload -> rows -> build_events decodes
    the PumpFun buy (amount/max_sol_cost from the fixture layout)."""
    from solana_event_stream_spark.plans.pipeline import build_events

    rows = list(entries_to_rows(fx["shred_entries_payload"], slot=42,
                                recv_us=9))
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in RAW_TRANSACTION_SCHEMA.fields)
         for r in rows], RAW_TRANSACTION_SCHEMA)
    events = build_events(df).collect()
    exp = fx["expected"]
    buys = [e for e in events if e.event_type == "PumpFunBuy"]
    assert len(buys) == 1
    assert int(buys[0].amount) == exp["buy_amount"]
    assert int(buys[0].max_sol_cost) == exp["buy_max_sol_cost"]
    assert buys[0].program_id == exp["pumpfun_program"]
    assert buys[0].block_time is None


def test_live_reader_import_gate():
    """Without grpc, constructing a live reader raises the documented
    NotImplementedError; the simulate path is untouched."""
    from solana_event_stream_spark.sources.yellowstone import (
        YellowstoneStreamReader)
    try:
        import grpc  # noqa: F401
        pytest.skip("grpc installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        YellowstoneStreamReader(None, {"endpoint": "https://example:443"})
    r = YellowstoneStreamReader(None, {"endpoint": "simulate://"})
    assert r.simulate


def test_backpressure_block_and_drop():
    """Backpressure presets (common/config.rs:139-183): block never
    loses (producer waits), drop loses and COUNTS (the A4 dropped-event
    counter, metrics.rs:517-553)."""
    import threading

    from solana_event_stream_spark.sources.transport import (
        BACKPRESSURE_PRESETS, LiveSubscription)

    assert BACKPRESSURE_PRESETS["high_throughput"] == (20000, "drop")
    assert BACKPRESSURE_PRESETS["low_latency"] == (4000, "block")

    # drop mode: overflow increments the counter, buffer stays bounded
    sub = LiveSubscription("x", {"capacity": "3",
                                 "backpressureStrategy": "drop"})
    for i in range(10):
        sub._push(("transaction", i))
    assert len(sub.drain(100)) == 3
    assert sub.dropped == 7

    # block mode: a full buffer blocks the producer until drained
    sub = LiveSubscription("x", {"capacity": "3"})
    for i in range(3):
        sub._push(("transaction", i))
    done = threading.Event()

    def producer():
        sub._push(("transaction", 99))
        done.set()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    assert not done.wait(0.3)          # blocked while full
    assert len(sub.drain(2)) == 2
    assert done.wait(5)                # unblocked after drain
    assert sub.dropped == 0
    got = sub.drain(10)
    assert [v for _, v in got] == [2, 99]  # FIFO, nothing lost
