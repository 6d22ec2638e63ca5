"""ShredStream source (S2, shred_stream.rs:21-92): the low-latency path.

Differences from the Yellowstone source, mirrored from the reference:
- entries arrive as slot-batched lists and explode to transactions (E3,
  shred_stream.rs:52-56) — partitions here are slot ranges whose read()
  performs the entry->transaction explode;
- no transaction meta: block_time is NULL, inner_instructions is empty
  (core/event_parser.rs:144, common/event_processor.rs:113-152), so J1
  CPI merge and J2 swap-data produce NULLs downstream and PumpFun
  Migrate events are dropped (F9);
- rows carry source='shred'.

Live transport requires the grpc package (absent in this container);
`endpoint=simulate://` runs the deterministic generator. The optional J6
backfill join (blockmeta slot-equi-join to recover block_time — an
improvement over the reference, which leaves it 0) is provided as
`backfill_block_time`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

from ..schemas import RAW_TRANSACTION_SCHEMA

SLOTS_PER_BATCH = 4
ENTRIES_PER_SLOT = 2
TXS_PER_ENTRY = 2


class _SlotRange(InputPartition):
    def __init__(self, start: int, end: int, options: dict):
        self.start = start
        self.end = end
        self.options = options


def _simulated_entries(slot: int):
    """Deterministic entries for a slot: each entry is a list of
    transactions (the bincode Vec<Entry> analog)."""
    import random
    import struct
    import time

    from ..operators.decode import b58encode
    from ..registry import PUMPFUN_PROGRAM_ID, SYSTEM_PROGRAMS

    rng = random.Random(slot * 31 + 7)

    def pk():
        return b58encode(bytes(rng.getrandbits(8) for _ in range(32)))

    entries = []
    for _ in range(ENTRIES_PER_SLOT):
        txs = []
        for _ in range(TXS_PER_ENTRY):
            accounts = [pk() for _ in range(16)]
            accounts[7] = SYSTEM_PROGRAMS[2]
            accounts[8] = SYSTEM_PROGRAMS[0]
            data = (bytes([102, 6, 61, 18, 1, 218, 235, 234])
                    + struct.pack("<Q", slot) + struct.pack("<Q", 1))
            txs.append({
                "signature": b58encode(
                    bytes(rng.getrandbits(8) for _ in range(64))),
                "accounts": accounts + [PUMPFUN_PROGRAM_ID],
                "instructions": [{
                    "program_id_index": 16,
                    "account_indices": list(range(16)), "data": data}],
                "recv_us": time.time_ns() // 1000,
            })
        entries.append(txs)
    return entries


class ShredStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.options = {k.lower(): v for k, v in options.items()}
        endpoint = self.options.get("endpoint", "")
        self.simulate = endpoint.startswith("simulate://") or not endpoint
        if not self.simulate:
            from .transport import LiveSubscription
            self.live = LiveSubscription(endpoint, self.options)
            self._connect_live(endpoint)
        self.start_slot = int(self.options.get("startslot", "0"))

    def _connect_live(self, endpoint: str):  # pragma: no cover - no grpc
        """subscribe_entries via the jito shredstream-proxy stubs
        (shred/connection.rs:13-34); the bincode entry decode is the pure
        transport.entries_to_rows, golden-tested offline."""
        try:
            import grpc
            from shredstream_proxy import (shredstream_pb2 as proto,
                                           shredstream_pb2_grpc as proto_grpc)
        except ImportError as exc:
            raise NotImplementedError(
                "live ShredStream requires the grpc package and the "
                "shredstream-proxy proto stubs (neither in this "
                "container); use endpoint=simulate://") from exc
        channel = grpc.insecure_channel(endpoint)
        stub = proto_grpc.ShredstreamProxyStub(channel)
        self.live.start_shredstream(stub, proto.SubscribeEntriesRequest())

    def initialOffset(self):
        return {"slot": self.start_slot}

    def latestOffset(self):
        if not hasattr(self, "_tip"):
            self._tip = self.start_slot
        if self.simulate:
            self._tip += SLOTS_PER_BATCH
            return {"slot": self._tip}
        max_rows = int(self.options.get("maxrowspertrigger", "10000"))
        rows = [r for _, r in self.live.drain(max_rows)]
        if not hasattr(self, "_live_cache"):
            self._live_cache = {}
        self._live_cache[(self._tip, self._tip + len(rows))] = rows
        self._tip += len(rows)
        return {"slot": self._tip}

    def partitions(self, start, end):
        s, e = start["slot"], end["slot"]
        if e <= s:
            return [_SlotRange(s, s, self.options)]
        if not self.simulate:
            part = _SlotRange(s, e, self.options)
            cache = getattr(self, "_live_cache", {})
            part.rows = [r for (a, b), rs in sorted(cache.items())
                         if a >= s and b <= e for r in rs]
            return [part]
        return [_SlotRange(i, i + 1, self.options) for i in range(s, e)]

    def commit(self, end):
        if not self.simulate and hasattr(self, "_live_cache"):
            e = end["slot"]
            for key in [k for k in self._live_cache if k[1] <= e]:
                del self._live_cache[key]

    def read(self, partition: _SlotRange):
        fields = [f.name for f in RAW_TRANSACTION_SCHEMA.fields]
        if getattr(partition, "rows", None) is not None:
            for t in partition.rows:
                yield tuple(t.get(f) for f in fields)
            return
        for slot in range(partition.start, partition.end):
            tx_index = 0
            # E3: entry -> transactions explode (shred_stream.rs:52-56)
            for entry in _simulated_entries(slot):
                for t in entry:
                    row = {
                        "slot": slot, "transaction_index": tx_index,
                        "block_time": None,  # shreds carry no meta
                        "signature": t["signature"], "is_vote": False,
                        "recv_us": t["recv_us"],
                        "static_account_keys": t["accounts"],
                        "loaded_writable_addresses": [],
                        "loaded_readonly_addresses": [],
                        "instructions": t["instructions"],
                        "inner_instructions": [],  # none on the shred path
                        "source": "shred",
                    }
                    tx_index += 1
                    yield tuple(row[f] for f in fields)


class ShredStreamDataSource(DataSource):
    """spark.readStream.format("shredstream") after registration."""

    @classmethod
    def name(cls):
        return "shredstream"

    def schema(self):
        return RAW_TRANSACTION_SCHEMA

    def streamReader(self, schema):
        return ShredStreamReader(schema, self.options)


def backfill_block_time(shred_events: DataFrame,
                        blockmeta: DataFrame) -> DataFrame:
    """J6 (optional): slot-equi-join with the blockmeta stream/table to
    backfill block_time for shred-sourced events (SURVEY §2.6 J6 — the
    reference leaves shred block_time at 0)."""
    bm = blockmeta.select(F.col("slot").alias("bm_slot"),
                          F.col("block_time").alias("bm_block_time"))
    return (shred_events.join(
        F.broadcast(bm), shred_events.slot == bm.bm_slot, "left")
        .withColumn("block_time",
                    F.coalesce(F.col("block_time"), F.col("bm_block_time")))
        .withColumn("block_time_ms",
                    F.when(F.col("block_time_ms") != 0, F.col("block_time_ms"))
                    .otherwise(F.coalesce(
                        (F.unix_micros(F.col("bm_block_time")) / 1000)
                        .cast("long"), F.lit(0))))
        .drop("bm_slot", "bm_block_time"))
