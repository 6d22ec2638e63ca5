"""Custom PySpark streaming source for Yellowstone Geyser gRPC (S1/S3/S5)
— a `pyspark.sql.datasource` DataSource with option-based server-side
pushdown, the one genuinely custom piece SURVEY §4 identifies.

Pushdown mapping (options -> Geyser subscribe request), mirroring
grpc/subscription.rs:56-131:

  protocols               -> which program-id tx filters to request
  accountInclude/Exclude/ accountRequired
                          -> TransactionFilter (F4)
  accountFilterOwners     -> AccountFilter.owner (F5)
  includeTransactions/Accounts/BlockMeta
                          -> which sub-streams to open (EventTypeFilter
                             gating, F3)
  commitment              -> commitment level (default processed,
                             grpc/subscription.rs:68-72)
  (vote=false, failed=false are hardwired, grpc/subscription.rs:121-122)

Network transport requires the `grpc` package; this container ships
without it, so `endpoint=simulate://...` runs a deterministic in-process
transaction generator with identical semantics (offsets = slot ranges,
recv_us stamped at read time as the reference stamps in its source,
grpc/types.rs:76). The DataSource machinery — offsets, partition
planning, commit, schema — is real and tested either way.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)

from ..schemas import RAW_ACCOUNT_SCHEMA, RAW_TRANSACTION_SCHEMA

SLOTS_PER_BATCH = 4
TXS_PER_SLOT = 3


class _SlotRange(InputPartition):
    def __init__(self, start: int, end: int, options: dict):
        self.start = start
        self.end = end
        self.options = options


def _simulated_accounts(slot: int, options: dict):
    """Deterministic per-slot account updates (SPL token accounts + one
    mint) for simulate mode with streamType=account — the S1 account
    sub-stream (F3 gating decides whether it opens at all,
    grpc/subscription.rs:81-105)."""
    import random
    import struct
    import time

    from ..operators.decode import b58encode

    spl_token = "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"
    rng = random.Random(slot * 17 + 3)

    def pk():
        return b58encode(bytes(rng.getrandbits(8) for _ in range(32)))

    def pk_bytes():
        return bytes(rng.getrandbits(8) for _ in range(32))

    owner_filter = options.get("accountfilterowners")
    out = []
    for i in range(TXS_PER_SLOT):
        # SPL token account: mint pk | owner pk | amount u64 | ... 165B
        data = (pk_bytes() + pk_bytes()
                + struct.pack("<Q", slot * 100 + i)
                + bytes(32) + b"\x01" + bytes(165 - 73 - 19) + bytes(19))
        data = data[:108] + b"\x01" + data[109:165]  # state=Initialized
        out.append({
            "slot": slot, "signature": pk() + pk(),  # 64B-ish display sig
            "pubkey": pk(), "executable": False,
            "lamports": 2_039_280, "owner": spl_token,
            "rent_epoch": 361, "data": data,
            "recv_us": time.time_ns() // 1000,
        })
    # one 82-byte mint per slot
    mint = bytes(36) + struct.pack("<Q", 10_000_000 + slot) + bytes([6]) \
        + bytes(82 - 45)
    out.append({
        "slot": slot, "signature": pk() + pk(), "pubkey": pk(),
        "executable": False, "lamports": 1_461_600, "owner": spl_token,
        "rent_epoch": 361, "data": mint,
        "recv_us": time.time_ns() // 1000,
    })
    if owner_filter:
        out = [a for a in out if a["owner"] in owner_filter.split(",")]
    return out


def _simulated_transactions(slot: int, options: dict):
    """Deterministic per-slot transactions (PumpFun buys) for simulate
    mode. Seeded by slot only, so replays are exactly reproducible."""
    import random
    import struct
    import time

    from ..operators.decode import b58encode
    from ..registry import PUMPFUN_PROGRAM_ID, SYSTEM_PROGRAMS

    rng = random.Random(slot)

    def pk():
        return b58encode(bytes(rng.getrandbits(8) for _ in range(32)))

    include = options.get("accountinclude")
    out = []
    for tx_index in range(TXS_PER_SLOT):
        accounts = [pk() for _ in range(16)]
        accounts[7] = SYSTEM_PROGRAMS[2]
        accounts[8] = SYSTEM_PROGRAMS[0]
        if include and tx_index == 0:
            accounts[0] = include  # server-side filter keeps this tx
        data = (bytes([102, 6, 61, 18, 1, 218, 235, 234])
                + struct.pack("<Q", slot * 1000 + tx_index)
                + struct.pack("<Q", 10_000))
        out.append({
            "slot": slot, "transaction_index": tx_index,
            "block_time": None, "signature": b58encode(
                bytes(rng.getrandbits(8) for _ in range(64))),
            "is_vote": False,
            "recv_us": time.time_ns() // 1000,  # stamped in-source
            "static_account_keys": accounts + [PUMPFUN_PROGRAM_ID],
            "loaded_writable_addresses": [],
            "loaded_readonly_addresses": [],
            "instructions": [{
                "program_id_index": 16,
                "account_indices": list(range(16)), "data": data}],
            "inner_instructions": [], "source": "grpc",
        })
    if include:
        out = [t for t in out
               if include in t["static_account_keys"]]
    return out


class YellowstoneStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.options = {k.lower(): v for k, v in options.items()}
        endpoint = self.options.get("endpoint", "")
        self.simulate = endpoint.startswith("simulate://") or not endpoint
        if not self.simulate:
            # Live transport: a driver-side LiveSubscription (bounded
            # buffer over the gRPC stream, sources/transport.py) drained
            # by a SimpleDataSourceStreamReader — matching the
            # reference's single-node subscriber. Requires grpc + the
            # generated yellowstone proto stubs.
            from .transport import LiveSubscription
            self.live = LiveSubscription(endpoint, self.options)
            self._connect_live(endpoint)
        self.start_slot = int(self.options.get("startslot", "0"))

    def _connect_live(self, endpoint: str):  # pragma: no cover - no grpc
        try:
            import grpc
            from yellowstone_grpc_proto import geyser_pb2 as proto
            from yellowstone_grpc_proto import geyser_pb2_grpc as proto_grpc
        except ImportError as exc:
            raise NotImplementedError(
                "live Yellowstone subscription requires the grpc package "
                "and yellowstone-grpc proto stubs (neither in this "
                "container); use endpoint=simulate:// for the "
                "deterministic generator") from exc
        channel = (grpc.secure_channel(endpoint, grpc.ssl_channel_credentials())
                   if endpoint.startswith("https://")
                   else grpc.insecure_channel(endpoint))
        stub = proto_grpc.GeyserStub(channel)
        self.live.start_yellowstone(proto, stub)

    def initialOffset(self):
        return {"slot": self.start_slot}

    def latestOffset(self):
        # simulate mode: a fixed number of new slots is available per
        # trigger. Live mode: offsets are positions in the driver-side
        # buffer — drain here (driver), attach rows to the partition
        # below (the reference has no replay either: no offset
        # persistence, at-most-once on restart, SURVEY §2.10).
        if not hasattr(self, "_tip"):
            self._tip = self.start_slot
        if self.simulate:
            self._tip += SLOTS_PER_BATCH
            return {"slot": self._tip}
        kind = self.options.get("streamtype", "transaction")
        max_rows = int(self.options.get("maxrowspertrigger", "10000"))
        rows = [r for k, r in self.live.drain(max_rows) if k == kind]
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
        # one partition per slot: parallel decode downstream
        return [_SlotRange(i, i + 1, self.options) for i in range(s, e)]

    def commit(self, end):
        # simulate mode has nothing to acknowledge; live mode frees
        # delivered buffer ranges
        if not self.simulate and hasattr(self, "_live_cache"):
            e = end["slot"]
            for key in [k for k in self._live_cache if k[1] <= e]:
                del self._live_cache[key]

    def read(self, partition: _SlotRange):
        kind = partition.options.get("streamtype", "transaction")
        schema = (RAW_ACCOUNT_SCHEMA if kind == "account"
                  else RAW_TRANSACTION_SCHEMA)
        fields = [f.name for f in schema.fields]
        if getattr(partition, "rows", None) is not None:
            for t in partition.rows:
                yield tuple(t.get(f) for f in fields)
            return
        gen = (_simulated_accounts if kind == "account"
               else _simulated_transactions)
        for slot in range(partition.start, partition.end):
            for t in gen(slot, partition.options):
                yield tuple(t[f] for f in fields)


class YellowstoneDataSource(DataSource):
    """spark.readStream.format("yellowstone") after
    spark.dataSource.register(YellowstoneDataSource)."""

    @classmethod
    def name(cls):
        return "yellowstone"

    def schema(self):
        # F3 gating picks the sub-stream; the account stream has its own
        # row shape (grpc/types.rs:22-32)
        opts = {k.lower(): v for k, v in self.options.items()}
        if opts.get("streamtype", "transaction") == "account":
            return RAW_ACCOUNT_SCHEMA
        return RAW_TRANSACTION_SCHEMA

    def streamReader(self, schema):
        return YellowstoneStreamReader(schema, self.options)


def subscription_request(options: dict) -> dict:
    """Render the server-side filter this source would push into the
    Geyser subscription (pure function; unit-testable without network).
    Mirrors grpc/subscription.rs:108-131."""
    opts = {k.lower(): v for k, v in options.items()}
    protocols = [p for p in opts.get("protocols", "").split(",") if p]
    from ..registry import PROGRAM_ID_BY_PROTOCOL
    req: dict = {"commitment": opts.get("commitment", "processed")}
    if opts.get("includetransactions", "true") == "true":
        req["transactions"] = {
            "client": {
                "vote": False, "failed": False,  # hardwired F6
                "account_include": [x for x in
                                    opts.get("accountinclude", "").split(",")
                                    if x]
                + [PROGRAM_ID_BY_PROTOCOL[p] for p in protocols
                   if p in PROGRAM_ID_BY_PROTOCOL],
                "account_exclude": [x for x in
                                    opts.get("accountexclude", "").split(",")
                                    if x],
                "account_required": [x for x in
                                     opts.get("accountrequired", "").split(",")
                                     if x],
            }
        }
    if opts.get("includeaccounts", "false") == "true":
        req["accounts"] = {
            "client": {"owner": [PROGRAM_ID_BY_PROTOCOL[p]
                                 for p in protocols
                                 if p in PROGRAM_ID_BY_PROTOCOL]}}
    if opts.get("includeblockmeta", "false") == "true":
        req["blocks_meta"] = {"client": {}}
    return req


def parse_offsets(start_json: str, end_json: str) -> tuple[int, int]:
    s = json.loads(start_json) if isinstance(start_json, str) else start_json
    e = json.loads(end_json) if isinstance(end_json, str) else end_json
    return s["slot"], e["slot"]
