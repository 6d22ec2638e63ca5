"""Protocol plug-in worked example (VERDICT r8 item 4, SURVEY §2.11):
an 8th protocol registered through `plugins.register_protocol` — pure
data + decoders, ZERO edits outside this test — must flow through the
whole engine: F1/D1 JVM dispatch, P5 decode on executors, J1 CPI merge,
the widened event schema, coexistence with the builtin protocols, the
merge-spec completeness gates, and clean unregistration."""

from __future__ import annotations

import datetime
import os

import pytest

TS_PID = "TestSwap1111111111111111111111111111111111"
TS_BUY_DISC = "0102030405060708"
TS_CREATE_DISC = "1112131415161718"
TS_CPI_DISC = "aa" * 8 + "01" * 8          # 16-byte inner discriminator

MINT = "MintAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
USER = "UserBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB"


def _ts_buy(data, accounts):
    if len(data) < 8 or len(accounts) < 2:
        return None
    return {"amount": int.from_bytes(data[:8], "little"),
            "mint": accounts[0], "user": accounts[1], "ts_flag": True}


def _ts_create(data, accounts):
    if len(accounts) < 1:
        return None
    return {"mint": accounts[0], "ts_label": "created"}


def _ts_cpi(body):
    if len(body) < 16:
        return None
    return {"ts_pool_fee": int.from_bytes(body[:8], "little"),
            "amount": int.from_bytes(body[8:16], "little")}


@pytest.fixture()
def plugin():
    from solana_event_stream_spark.plugins import register_protocol
    unregister = register_protocol(
        name="TestSwap",
        program_id=TS_PID,
        instruction_discriminators={TS_BUY_DISC: "TestSwapBuy",
                                    TS_CREATE_DISC: "TestSwapCreate"},
        instruction_decoders={"TestSwapBuy": _ts_buy,
                              "TestSwapCreate": _ts_create},
        payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                        "ts_flag": "bool", "ts_label": "str",
                        "ts_pool_fee": "u64"},
        inner_discriminators={TS_CPI_DISC: "testswap_trade"},
        cpi_decoders={"testswap_trade": _ts_cpi},
        merge_specs={"TestSwapBuy": ("testswap_trade",
                                     ["ts_pool_fee", "amount"])},
    )
    yield
    unregister()


def _plugin_raw(spark):
    """Two plug-in transactions + the golden fixture corpus, one frame."""
    from solana_event_stream_spark.plans.pipeline import (
        load_raw_transactions)
    from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA

    ix_buy = {"program_id_index": 2, "account_indices": [0, 1],
              "data": bytes.fromhex(TS_BUY_DISC)
              + (77).to_bytes(8, "little")}
    cpi = {"program_id_index": 2, "account_indices": [],
           "data": bytes.fromhex(TS_CPI_DISC)
           + (5).to_bytes(8, "little") + (99).to_bytes(8, "little")}
    ix_create = {"program_id_index": 1, "account_indices": [0],
                 "data": bytes.fromhex(TS_CREATE_DISC) + b"xyz"}
    ts = datetime.datetime(2026, 8, 14, tzinfo=datetime.timezone.utc)
    rows = [
        {"slot": 900001, "transaction_index": 0, "block_time": ts,
         "signature": "ts_sig_buy", "is_vote": False, "recv_us": 1,
         "static_account_keys": [MINT, USER, TS_PID],
         "loaded_writable_addresses": [], "loaded_readonly_addresses": [],
         "instructions": [ix_buy],
         "inner_instructions": [{"index": 0, "instructions": [cpi]}],
         "source": "test"},
        {"slot": 900002, "transaction_index": 0, "block_time": ts,
         "signature": "ts_sig_create", "is_vote": False, "recv_us": 2,
         "static_account_keys": [MINT, TS_PID],
         "loaded_writable_addresses": [], "loaded_readonly_addresses": [],
         "instructions": [ix_create], "inner_instructions": [],
         "source": "test"},
    ]
    plugin_raw = spark.createDataFrame(rows, RAW_TRANSACTION_SCHEMA)
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    golden = load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))
    return plugin_raw.unionByName(golden)


def test_plugin_flows_through_pipeline(spark, plugin):
    from pyspark.sql import functions as F

    from solana_event_stream_spark.plans.pipeline import build_events_core

    ev = build_events_core(_plugin_raw(spark))
    # the schema widened: plug-in fields exist alongside the builtins
    for col in ("ts_flag", "ts_label", "ts_pool_fee"):
        assert col in ev.columns

    rows = {r.event_type: r for r in ev.filter(
        F.col("protocol") == "TestSwap").collect()}
    assert set(rows) == {"TestSwapBuy", "TestSwapCreate"}

    buy = rows["TestSwapBuy"]
    assert buy.program_id == TS_PID
    assert buy.mint == MINT and buy.user == USER
    assert buy.ts_flag is True
    # J1 merge overwrote amount from the CPI (77 -> 99) and set the fee
    assert int(buy.amount) == 99
    assert int(buy.ts_pool_fee) == 5

    create = rows["TestSwapCreate"]
    assert create.ts_label == "created" and create.mint == MINT

    # builtin protocols still decode in the SAME frame (coexistence)
    n_builtin = ev.filter(F.col("protocol") != "TestSwap").count()
    from solana_event_stream_spark.plans.pipeline import (
        load_raw_transactions)
    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    golden_only = build_events_core(load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))).count()
    assert n_builtin == golden_only


def test_plugin_cpi_guards(spark, plugin):
    """A truncated plug-in CPI body must not merge (F7 on the plug-in's
    own decoder), and the instruction still decodes un-merged."""
    from pyspark.sql import functions as F

    from solana_event_stream_spark.plans.pipeline import build_events_core
    from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA
    import datetime as _dt

    cpi_short = {"program_id_index": 2, "account_indices": [],
                 "data": bytes.fromhex(TS_CPI_DISC) + b"\x01\x02"}
    ix = {"program_id_index": 2, "account_indices": [0, 1],
          "data": bytes.fromhex(TS_BUY_DISC) + (42).to_bytes(8, "little")}
    ts = _dt.datetime(2026, 8, 14, tzinfo=_dt.timezone.utc)
    raw = spark.createDataFrame([
        {"slot": 900003, "transaction_index": 0, "block_time": ts,
         "signature": "ts_sig_short", "is_vote": False, "recv_us": 3,
         "static_account_keys": [MINT, USER, TS_PID],
         "loaded_writable_addresses": [], "loaded_readonly_addresses": [],
         "instructions": [ix],
         "inner_instructions": [{"index": 0, "instructions": [cpi_short]}],
         "source": "test"}], RAW_TRANSACTION_SCHEMA)
    row = build_events_core(raw).filter(
        F.col("event_type") == "TestSwapBuy").collect()
    assert len(row) == 1
    assert int(row[0].amount) == 42          # instruction value kept
    assert row[0].ts_pool_fee is None        # no merge happened


def test_plugin_passes_merge_spec_gates(plugin):
    """The completeness gates run over the LIVE registries — the
    plug-in's entries must satisfy them with no exemption edits."""
    from tests import test_merge_spec_gate as gate

    gate.test_every_cpi_kind_feeds_a_merge_spec()
    gate.test_every_merge_spec_kind_has_a_discriminator_or_exemption()
    gate.test_every_merge_spec_event_type_has_an_instruction_decoder()


def test_unregister_restores_engine(spark):
    from solana_event_stream_spark.operators.decode import (
        CPI_DECODERS, INSTRUCTION_DECODERS)
    from solana_event_stream_spark.plugins import register_protocol
    from solana_event_stream_spark import registry, schemas

    before = (len(INSTRUCTION_DECODERS), len(CPI_DECODERS),
              len(schemas.PAYLOAD_FIELDS), registry.ALL_PROTOCOLS,
              len(registry.MERGE_SPECS))
    unregister = register_protocol(
        name="TestSwap", program_id=TS_PID,
        instruction_discriminators={TS_BUY_DISC: "TestSwapBuy"},
        instruction_decoders={"TestSwapBuy": _ts_buy},
        payload_fields={"ts_flag": "bool"})
    assert "TestSwap" in registry.ALL_PROTOCOLS
    assert "ts_flag" in schemas.event_schema().fieldNames()
    unregister()
    assert (len(INSTRUCTION_DECODERS), len(CPI_DECODERS),
            len(schemas.PAYLOAD_FIELDS), registry.ALL_PROTOCOLS,
            len(registry.MERGE_SPECS)) == before
    assert "ts_flag" not in schemas.event_schema().fieldNames()


def test_registration_validation():
    from solana_event_stream_spark.plugins import register_protocol

    with pytest.raises(ValueError, match="already registered"):
        register_protocol(
            name="PumpFun", program_id=TS_PID,
            instruction_discriminators={TS_BUY_DISC: "X"},
            instruction_decoders={"X": _ts_buy}, payload_fields={})
    with pytest.raises(ValueError, match="collides"):
        register_protocol(
            name="TestSwap", program_id=TS_PID,
            instruction_discriminators={TS_BUY_DISC: "PumpFunBuy"},
            instruction_decoders={"PumpFunBuy": _ts_buy},
            payload_fields={})
    with pytest.raises(ValueError, match="kind"):
        register_protocol(
            name="TestSwap", program_id=TS_PID,
            instruction_discriminators={TS_BUY_DISC: "TestSwapBuy"},
            instruction_decoders={"TestSwapBuy": _ts_buy},
            payload_fields={"amount": "str"})   # kind mismatch


def test_lake_schema_evolution_across_plugin_registration(spark):
    """VERDICT r8 item 7: the archive written BEFORE a plug-in widened
    the event schema must stay readable with the archive written after —
    batch read (mergeSchema), the stream reader's union-schema pin, the
    lake view, and snapshot compaction across the evolution boundary."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from solana_event_stream_spark.plans.pipeline import (
        build_events_core, load_raw_transactions)
    from solana_event_stream_spark.plugins import register_protocol
    from solana_event_stream_spark.schemas import RAW_TRANSACTION_SCHEMA
    from solana_event_stream_spark.sources.replay import (
        read_transaction_stream)
    from solana_event_stream_spark.streaming.event_archive import (
        compact_event_archive_snapshot, load_event_archive,
        load_event_lake, read_event_archive_stream,
        start_event_archive_stream)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    golden = load_raw_transactions(
        spark, os.path.join(fixtures, "raw_transactions.parquet"))
    n_v1 = build_events_core(golden).count()

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "src")
        archive = os.path.join(tmp, "events")
        ckpt = os.path.join(tmp, "ckpt")
        compacted = os.path.join(tmp, "compacted")
        os.makedirs(compacted)

        # ---- schema v1: builtin protocols only --------------------------
        golden.coalesce(1).write.mode("append").parquet(src)
        q = start_event_archive_stream(
            read_transaction_stream(spark, src), archive, ckpt,
            available_now=True)
        q.awaitTermination(180)
        v1_cols = set(load_event_archive(spark, archive).columns)
        assert "ts_pool_fee" not in v1_cols

        # ---- register the plug-in; schema v2 into the SAME archive ------
        unregister = register_protocol(
            name="TestSwap", program_id=TS_PID,
            instruction_discriminators={TS_BUY_DISC: "TestSwapBuy"},
            instruction_decoders={"TestSwapBuy": _ts_buy},
            payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                            "ts_flag": "bool", "ts_pool_fee": "u64"},
            inner_discriminators={TS_CPI_DISC: "testswap_trade"},
            cpi_decoders={"testswap_trade": _ts_cpi},
            merge_specs={"TestSwapBuy": ("testswap_trade",
                                         ["ts_pool_fee", "amount"])})
        try:
            ix = {"program_id_index": 2, "account_indices": [0, 1],
                  "data": bytes.fromhex(TS_BUY_DISC)
                  + (77).to_bytes(8, "little")}
            cpi = {"program_id_index": 2, "account_indices": [],
                   "data": bytes.fromhex(TS_CPI_DISC)
                   + (5).to_bytes(8, "little")
                   + (99).to_bytes(8, "little")}
            ts = datetime.datetime(2026, 8, 14,
                                   tzinfo=datetime.timezone.utc)
            plugin_raw = spark.createDataFrame([
                {"slot": 900001, "transaction_index": 0, "block_time": ts,
                 "signature": "ts_sig_buy", "is_vote": False,
                 "recv_us": 1,
                 "static_account_keys": [MINT, USER, TS_PID],
                 "loaded_writable_addresses": [],
                 "loaded_readonly_addresses": [],
                 "instructions": [ix],
                 "inner_instructions": [{"index": 0,
                                         "instructions": [cpi]}],
                 "source": "test"}], RAW_TRANSACTION_SCHEMA)
            _time.sleep(1.1)
            plugin_raw.coalesce(1).write.mode("append").parquet(src)
            q = start_event_archive_stream(     # SAME checkpoint + dir
                read_transaction_stream(spark, src), archive, ckpt,
                available_now=True)
            q.awaitTermination(180)

            # batch read across the boundary: old rows NULL-fill the new
            # columns, the plug-in row carries its merged values
            df = load_event_archive(spark, archive, merge_schema=True)
            assert "ts_pool_fee" in df.columns
            assert df.count() == n_v1 + 1
            buy = df.filter(F.col("event_type") == "TestSwapBuy").collect()
            assert len(buy) == 1 and int(buy[0].amount) == 99 \
                and int(buy[0].ts_pool_fee) == 5
            assert df.filter(F.col("ts_pool_fee").isNotNull()).count() == 1

            # the STREAM reader's schema is the union, not whichever
            # file single-file inference sampled
            assert "ts_pool_fee" in \
                read_event_archive_stream(spark, archive).schema.names

            # snapshot compaction across the evolution boundary
            stats = compact_event_archive_snapshot(spark, archive,
                                                   compacted)
            assert stats["gen"] == 1
            lake = load_event_lake(spark, archive, compacted)
            assert lake.count() == n_v1 + 1
            assert "ts_pool_fee" in lake.columns
            assert lake.filter(
                F.col("ts_pool_fee").isNotNull()).count() == 1
        finally:
            unregister()


def _ts_vector_specs():
    """The declarative fixed-layout form of _ts_buy/_ts_cpi — must agree
    with the per-row decoders bit for bit (the differential below is the
    proof)."""
    from solana_event_stream_spark.operators.decode_vec import (
        CpiSpec, InstSpec)
    return {"TestSwapBuy": InstSpec(
        "TestSwapBuy", min_data=8, min_accounts=2,
        nums=(("amount", "u64", 0),),
        accounts=(("mint", "idx", 0), ("user", "idx", 1)),
        consts={"ts_flag": True},
        cpi=CpiSpec("testswap_trade", 16,
                    nums=(("ts_pool_fee", "u64", 0),
                          ("amount", "u64", 8))))}


def test_plugin_vector_spec_fast_path(spark):
    """VERDICT r9 item 4: a plug-in registered WITH vector_specs decodes
    on the vectorized fast path (no per-row Python for its rows) and
    stays bit-identical to the per-row decoders; unregistration restores
    the spec table exactly."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from solana_event_stream_spark.operators import decode_vec
    from solana_event_stream_spark.plugins import register_protocol

    specs_before = dict(decode_vec.SPECS)
    unregister = register_protocol(
        name="TestSwap",
        program_id=TS_PID,
        instruction_discriminators={TS_BUY_DISC: "TestSwapBuy",
                                    TS_CREATE_DISC: "TestSwapCreate"},
        instruction_decoders={"TestSwapBuy": _ts_buy,
                              "TestSwapCreate": _ts_create},
        payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                        "ts_flag": "bool", "ts_label": "str",
                        "ts_pool_fee": "u64"},
        inner_discriminators={TS_CPI_DISC: "testswap_trade"},
        cpi_decoders={"testswap_trade": _ts_cpi},
        merge_specs={"TestSwapBuy": ("testswap_trade",
                                     ["ts_pool_fee", "amount"])},
        vector_specs=_ts_vector_specs(),
    )
    try:
        assert "TestSwapBuy" in decode_vec.SPECS
        from solana_event_stream_spark.plans.pipeline import (
            _decode_batches, build_decode_input, build_events_core)

        din = build_decode_input(_plugin_raw(spark))
        batch = din.toArrow().combine_chunks().to_batches()[0]

        # the plug-in type actually ENGAGES the fast path (not deferred)
        groups, slow = decode_vec.decode_batch_vectorized(batch)
        fast_types = {g.etypes for g in groups if isinstance(g.etypes, str)}
        assert "TestSwapBuy" in fast_types
        etype_l = batch.column(
            batch.schema.names.index("event_type")).to_pylist()
        assert all(etype_l[i] != "TestSwapBuy" for i in slow.tolist())

        # bit-identical to the per-row path on the full mixed batch
        vec = pa.Table.from_batches(
            list(_decode_batches(iter([batch]), None, vectorized=True)))
        py = pa.Table.from_batches(
            list(_decode_batches(iter([batch]), None, vectorized=False)))
        assert vec.num_rows == py.num_rows and vec.schema.equals(py.schema)
        for name in vec.schema.names:
            assert vec.column(name).equals(py.column(name)), name

        # end-to-end through executors (specs ship in the closure)
        buy = build_events_core(_plugin_raw(spark)).filter(
            F.col("event_type") == "TestSwapBuy").collect()
        assert len(buy) == 1
        assert int(buy[0].amount) == 99 and int(buy[0].ts_pool_fee) == 5
        assert buy[0].ts_flag is True
    finally:
        unregister()
    assert dict(decode_vec.SPECS) == specs_before
    assert decode_vec._FAST_TYPES == tuple(specs_before)


def test_plugin_vector_spec_validation():
    """Bad vector specs fail loudly BEFORE any registry mutation."""
    import pytest as _pytest

    from solana_event_stream_spark import registry
    from solana_event_stream_spark.operators import decode_vec
    from solana_event_stream_spark.operators.decode_vec import (
        CpiSpec, InstSpec)
    from solana_event_stream_spark.plugins import register_protocol

    before = (dict(decode_vec.SPECS), registry.ALL_PROTOCOLS)
    common = dict(
        name="TestSwap", program_id=TS_PID,
        instruction_discriminators={TS_BUY_DISC: "TestSwapBuy"},
        instruction_decoders={"TestSwapBuy": _ts_buy},
        payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                        "ts_flag": "bool"})

    with _pytest.raises(ValueError, match="registered instruction"):
        register_protocol(**common, vector_specs={
            "Nope": InstSpec("Nope", 0, 0)})
    with _pytest.raises(ValueError, match="requires_cpi flag disagrees"):
        register_protocol(**common, vector_specs={
            "TestSwapBuy": InstSpec("TestSwapBuy", 8, 2,
                                    requires_cpi=True)})
    # CPI spec that omits a merge-listed field trips the drift gate
    with _pytest.raises(AssertionError):
        register_protocol(
            **common,
            inner_discriminators={TS_CPI_DISC: "testswap_trade"},
            cpi_decoders={"testswap_trade": _ts_cpi},
            merge_specs={"TestSwapBuy": ("testswap_trade",
                                         ["amount"])},
            vector_specs={"TestSwapBuy": InstSpec(
                "TestSwapBuy", 8, 2,
                cpi=CpiSpec("testswap_trade", 16, nums=()))})
    assert (dict(decode_vec.SPECS), registry.ALL_PROTOCOLS) == before


# ---------------------------------------------------------------------------
# r11: the ACCOUNT-STATE half of the plug-in contract (VERDICT r10
# parity nuance) — a reference protocol module ships an account parser
# too (pumpfun/types.rs:35-57, dispatched at core/dispatcher.rs:248-288);
# an 8th-protocol plug-in must route its account updates through D3
# with zero engine edits.
# ---------------------------------------------------------------------------

TS_ACCT_DISC = "f0e1d2c3b4a59687"


def _ts_pool_account(data):
    # layout: 8B disc + u64 reserve + owner pk; None on short input (F7)
    if len(data) < 8 + 8 + 32:
        return None
    from solana_event_stream_spark.operators.decode import b58encode
    return {"ts_reserve": int.from_bytes(data[8:16], "little"),
            "ts_pool_owner": b58encode(data[16:48])}


@pytest.fixture()
def account_plugin():
    from solana_event_stream_spark.plugins import register_protocol
    unregister = register_protocol(
        name="TestSwap",
        program_id=TS_PID,
        instruction_discriminators={TS_BUY_DISC: "TestSwapBuy"},
        instruction_decoders={"TestSwapBuy": _ts_buy},
        payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                        "ts_flag": "bool"},
        account_discriminators={TS_ACCT_DISC: "AccountTestSwapPool"},
        account_decoders={"AccountTestSwapPool": _ts_pool_account},
        account_payload_fields={"ts_reserve": "u64",
                                "ts_pool_owner": "pk",
                                # reuse of a base column with its kind
                                "lp_supply": "u64"},
    )
    yield
    unregister()


def _acct_rows(spark, extra_rows=()):
    from solana_event_stream_spark.schemas import RAW_ACCOUNT_SCHEMA
    base = {"slot": 1, "signature": "s", "pubkey": "PK", "executable":
            False, "lamports": 10, "owner": TS_PID, "rent_epoch": 0,
            "recv_us": 5}
    good = dict(base, pubkey="PoolPk", data=(
        bytes.fromhex(TS_ACCT_DISC) + (4242).to_bytes(8, "little")
        + bytes(range(32))))
    short = dict(base, pubkey="ShortPk", data=b"\x01\x02")   # no disc
    torn = dict(base, pubkey="TornPk", data=(
        bytes.fromhex(TS_ACCT_DISC) + b"\x01\x02"))  # disc, short body
    return spark.createDataFrame(
        [good, short, torn, *extra_rows], RAW_ACCOUNT_SCHEMA)


def test_plugin_account_decoder_flows_through_d3(spark, account_plugin):
    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events, load_raw_accounts)

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    builtin_raw = load_raw_accounts(
        spark, os.path.join(fixtures, "raw_accounts.parquet"))
    out = build_account_events(
        _acct_rows(spark).unionByName(builtin_raw))
    assert "ts_reserve" in out.columns and "ts_pool_owner" in out.columns
    rows = {r.pubkey: r for r in out.collect()}

    good = rows["PoolPk"]
    assert good.protocol == "TestSwap"
    assert good.event_type == "AccountTestSwapPool"
    assert int(good.ts_reserve) == 4242
    assert good.ts_pool_owner and good.lamports == 10
    # short/torn data falls through the common path, exactly like a
    # builtin protocol account that fails its decoder (F7)
    for pk in ("ShortPk", "TornPk"):
        assert rows[pk].protocol == "Common"
        assert rows[pk].event_type == "TokenAccount"
        assert rows[pk].ts_reserve is None
    # builtin protocol accounts still decode alongside the plug-in
    assert any(r.protocol not in ("TestSwap", "Common")
               for r in rows.values())


def test_plugin_account_unregister_restores(spark):
    from solana_event_stream_spark.operators.account_decode import (
        ACCOUNT_DISCRIMINATORS, ACCOUNT_PLUGIN_FIELDS,
        PROTOCOL_ACCOUNT_DECODERS)
    from solana_event_stream_spark.plans.account_pipeline import (
        build_account_events)
    from solana_event_stream_spark.plugins import register_protocol

    before = (dict(ACCOUNT_DISCRIMINATORS), dict(PROTOCOL_ACCOUNT_DECODERS),
              dict(ACCOUNT_PLUGIN_FIELDS))
    unregister = register_protocol(
        name="TestSwap", program_id=TS_PID,
        instruction_discriminators={TS_BUY_DISC: "TestSwapBuy"},
        instruction_decoders={"TestSwapBuy": _ts_buy},
        payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                        "ts_flag": "bool"},
        account_discriminators={TS_ACCT_DISC: "AccountTestSwapPool"},
        account_decoders={"AccountTestSwapPool": _ts_pool_account},
        account_payload_fields={"ts_reserve": "u64"},
    )
    assert ("TestSwap", TS_ACCT_DISC) in ACCOUNT_DISCRIMINATORS
    unregister()
    assert (dict(ACCOUNT_DISCRIMINATORS), dict(PROTOCOL_ACCOUNT_DECODERS),
            dict(ACCOUNT_PLUGIN_FIELDS)) == before
    out = build_account_events(_acct_rows(spark))
    assert "ts_reserve" not in out.columns
    rows = {r.pubkey: r for r in out.collect()}
    assert rows["PoolPk"].protocol == "Common"   # plug-in gone: common path


def test_plugin_account_validation():
    from solana_event_stream_spark.plugins import register_protocol

    def _reg(**kw):
        base = dict(
            name="TestSwapV", program_id=TS_PID + "V",
            instruction_discriminators={TS_BUY_DISC: "TestSwapVBuy"},
            instruction_decoders={"TestSwapVBuy": _ts_buy},
            payload_fields={"amount": "u64", "mint": "pk", "user": "pk",
                            "ts_flag": "bool"})
        base.update(kw)
        return register_protocol(**base)

    with pytest.raises(ValueError, match="8 bytes of lowercase hex"):
        _reg(account_discriminators={"zz": "A"},
             account_decoders={"A": _ts_pool_account})
    # ADVICE r11: right length + lowercase but NOT hex — previously
    # registered fine and could never match data.hex() (dead route)
    with pytest.raises(ValueError, match="8 bytes of lowercase hex"):
        _reg(account_discriminators={"g0e1f2a3b4c5d6e7": "A"},
             account_decoders={"A": _ts_pool_account})
    with pytest.raises(ValueError, match="keys must equal"):
        _reg(account_discriminators={TS_ACCT_DISC: "A"},
             account_decoders={})
    with pytest.raises(ValueError, match="collides"):
        _reg(account_discriminators={
                TS_ACCT_DISC: "AccountPumpFunBondingCurve"},
             account_decoders={
                "AccountPumpFunBondingCurve": _ts_pool_account})
    with pytest.raises(ValueError, match="unknown account field kind"):
        _reg(account_discriminators={TS_ACCT_DISC: "A"},
             account_decoders={"A": _ts_pool_account},
             account_payload_fields={"x": "nope"})
    with pytest.raises(ValueError, match="exists in the base schema"):
        _reg(account_discriminators={TS_ACCT_DISC: "A"},
             account_decoders={"A": _ts_pool_account},
             account_payload_fields={"lp_supply": "bool"})
    with pytest.raises(ValueError, match="without account_decoders"):
        _reg(account_payload_fields={"ts_x": "u64"})
    # a failed registration must leave no account-side residue
    from solana_event_stream_spark.operators.account_decode import (
        ACCOUNT_DISCRIMINATORS, ACCOUNT_PLUGIN_FIELDS)
    assert not [k for k in ACCOUNT_DISCRIMINATORS if k[0] == "TestSwapV"]
    assert "ts_x" not in ACCOUNT_PLUGIN_FIELDS
