"""Live gRPC transport for S1 (Yellowstone Geyser) and S2 (ShredStream),
factored so everything except the socket is pure and unit-testable:

- ``tx_update_to_row`` / ``account_update_to_row`` /
  ``blockmeta_update_to_row`` / ``subscribe_update_to_rows``: the
  SubscribeUpdate -> row mapping, mirroring the reference's pooled
  factories (`grpc/pool.rs:271-291` transaction, `:96-121` account,
  `:191-201` blockmeta) and its stream demux
  (`yellowstone_grpc.rs:183-275` UpdateOneof match). They accept
  dict-shaped messages (what ``protobuf.MessageToDict``-style adapters or
  the committed fixtures produce), so they run — and are golden-tested —
  without grpc installed.
- ``decode_entries``: bincode/short-vec decoder for the ShredStream
  entry payload (`shred_stream.rs:60` `bincode::deserialize::<Vec<Entry>>`),
  using Solana's public wire layout: bincode vectors are u64
  little-endian length-prefixed, while vectors INSIDE a transaction
  (signatures, account keys, instruction accounts/data) use the compact-
  u16 "short_vec" encoding; a version-prefixed message starts with a
  byte whose MSB is set (0x80 | version), legacy messages start directly
  with the header.
- ``entries_to_rows``: entry -> transaction rows (E3 explode,
  `shred_stream.rs:52-66`): no meta on this path, so block_time is NULL
  and inner_instructions empty (`core/event_parser.rs:144`).
- ``LiveSubscription``: the socket half — import-gated on ``grpc``; it
  feeds a bounded buffer the stream readers drain (the reference's
  bounded-channel backpressure, `common/config.rs:139-183`).
"""

from __future__ import annotations

import threading
from collections import deque
from datetime import datetime, timezone

from ..operators.decode import b58encode

# ---------------------------------------------------------------------------
# SubscribeUpdate -> row mapping (pure)
# ---------------------------------------------------------------------------


def _ts_to_datetime(ts):
    """Proto Timestamp {seconds, nanos} -> tz-aware datetime (or None)."""
    if ts is None:
        return None
    seconds = int(ts.get("seconds", 0))
    nanos = int(ts.get("nanos", 0))
    return datetime.fromtimestamp(seconds + nanos / 1e9, tz=timezone.utc)


def _pk(raw) -> str:
    return b58encode(bytes(raw)) if raw is not None else None


def _compiled_instruction(ix: dict) -> dict:
    return {
        "program_id_index": int(ix.get("program_id_index", 0)),
        "account_indices": [int(b) for b in bytes(ix.get("accounts", b""))],
        "data": bytes(ix.get("data", b"")),
    }


def tx_update_to_row(update: dict, recv_us: int) -> dict:
    """SubscribeUpdateTransaction -> raw transaction row.

    Mirrors `grpc/pool.rs:271-291` (slot, index, block_time, signature,
    is_vote, recv stamp) plus the message/meta field extraction the parse
    pipeline consumes (`core/event_parser.rs:49-82`: static keys ++
    loaded writable ++ loaded readonly; outer and inner instructions).
    """
    tx = update["transaction"]
    message = tx.get("transaction", {}).get("message", {})
    meta = tx.get("meta", {}) or {}
    inner = [
        {
            "index": int(grp.get("index", 0)),
            "instructions": [_compiled_instruction(ix)
                             for ix in grp.get("instructions", [])],
        }
        for grp in meta.get("inner_instructions", [])
    ]
    return {
        "slot": int(update.get("slot", 0)),
        "transaction_index": int(tx.get("index", 0)),
        "block_time": _ts_to_datetime(update.get("created_at")),
        "signature": b58encode(bytes(tx.get("signature", b"\x00" * 64))),
        "is_vote": bool(tx.get("is_vote", False)),
        "recv_us": recv_us,
        "static_account_keys": [_pk(k) for k in
                                message.get("account_keys", [])],
        "loaded_writable_addresses": [_pk(k) for k in
                                      meta.get("loaded_writable_addresses",
                                               [])],
        "loaded_readonly_addresses": [_pk(k) for k in
                                      meta.get("loaded_readonly_addresses",
                                               [])],
        "instructions": [_compiled_instruction(ix)
                         for ix in message.get("instructions", [])],
        "inner_instructions": inner,
        "source": "grpc",
    }


def account_update_to_row(update: dict, recv_us: int) -> dict:
    """SubscribeUpdateAccount -> raw account row (`grpc/pool.rs:96-121`;
    missing txn_signature maps to the default signature, i.e. all-zero)."""
    info = update["account"]
    sig = info.get("txn_signature")
    return {
        "slot": int(update.get("slot", 0)),
        "signature": b58encode(bytes(sig) if sig is not None
                               else b"\x00" * 64),
        "pubkey": _pk(info.get("pubkey")),
        "executable": bool(info.get("executable", False)),
        "lamports": int(info.get("lamports", 0)),
        "owner": _pk(info.get("owner")),
        "rent_epoch": int(info.get("rent_epoch", 0)),
        "data": bytes(info.get("data", b"")),
        "recv_us": recv_us,
    }


def blockmeta_update_to_row(update: dict, recv_us: int) -> dict:
    """SubscribeUpdateBlockMeta -> blockmeta row (`grpc/pool.rs:191-201`)."""
    return {
        "slot": int(update.get("slot", 0)),
        "block_hash": update.get("blockhash", ""),
        "block_time": _ts_to_datetime(update.get("block_time")),
        "recv_us": recv_us,
    }


def subscribe_update_to_rows(update: dict, recv_us: int):
    """Demux one SubscribeUpdate into (kind, row) pairs — the
    `UpdateOneof::{Transaction, Account, BlockMeta, Ping}` match of
    `yellowstone_grpc.rs:183-275`. Ping/Pong and unknown variants yield
    nothing (the reference answers pings transport-side)."""
    if "transaction" in update:
        yield "transaction", tx_update_to_row(update, recv_us)
    elif "account" in update:
        yield "account", account_update_to_row(update, recv_us)
    elif "block_meta" in update:
        yield "block_meta", blockmeta_update_to_row(update["block_meta"],
                                                    recv_us)


# ---------------------------------------------------------------------------
# ShredStream entry payload decode (bincode + short_vec, pure)
# ---------------------------------------------------------------------------


class _Cur:
    __slots__ = ("d", "o")

    def __init__(self, d: bytes):
        self.d = d
        self.o = 0

    def take(self, n: int) -> bytes:
        if self.o + n > len(self.d):
            raise ValueError("truncated entry payload")
        v = self.d[self.o:self.o + n]
        self.o += n
        return v

    def u8(self) -> int:
        return self.take(1)[0]

    def u64(self) -> int:
        return int.from_bytes(self.take(8), "little")

    def short_u16(self) -> int:
        """Solana compact-u16: 7 bits per byte, LSB first, max 3 bytes."""
        out = 0
        for shift in (0, 7, 14):
            b = self.u8()
            out |= (b & 0x7F) << shift
            if (b & 0x80) == 0:
                return out
        raise ValueError("malformed compact-u16")


def _read_compiled_instruction(c: _Cur) -> dict:
    program_id_index = c.u8()
    n_accounts = c.short_u16()
    accounts = list(c.take(n_accounts))
    n_data = c.short_u16()
    data = c.take(n_data)
    return {"program_id_index": program_id_index,
            "account_indices": accounts, "data": data}


def _read_message(c: _Cur) -> dict:
    """Legacy or v0 message; returns static keys, instructions, and (v0)
    address-table lookups. The first byte's MSB distinguishes: 0x80 |
    version prefix vs legacy num_required_signatures (public Solana wire
    rule; the shred path only needs static keys + compiled instructions,
    `core/event_parser.rs:111-194` with inner_instructions = &[])."""
    first = c.u8()
    if first & 0x80:
        version = first & 0x7F
        if version != 0:
            raise ValueError(f"unsupported message version {version}")
        c.take(2)  # rest of header (3 bytes total, first consumed above)
    else:
        c.take(2)  # legacy: `first` was header byte 0
    n_keys = c.short_u16()
    keys = [b58encode(c.take(32)) for _ in range(n_keys)]
    c.take(32)  # recent_blockhash
    n_ix = c.short_u16()
    instructions = [_read_compiled_instruction(c) for _ in range(n_ix)]
    lookups = []
    if first & 0x80:
        n_lookups = c.short_u16()
        for _ in range(n_lookups):
            account_key = b58encode(c.take(32))
            n_w = c.short_u16()
            writable = list(c.take(n_w))
            n_r = c.short_u16()
            readonly = list(c.take(n_r))
            lookups.append({"account_key": account_key,
                            "writable_indexes": writable,
                            "readonly_indexes": readonly})
    return {"account_keys": keys, "instructions": instructions,
            "address_table_lookups": lookups}


def _read_transaction(c: _Cur) -> dict:
    n_sigs = c.short_u16()
    sigs = [b58encode(c.take(64)) for _ in range(n_sigs)]
    message = _read_message(c)
    return {"signatures": sigs, "message": message}


def decode_entries(payload: bytes) -> list[dict]:
    """bincode `Vec<Entry>` (`shred_stream.rs:60`): Entry = { num_hashes
    u64, hash [32], transactions Vec<VersionedTransaction> }; outer
    vectors are bincode (u64 LE length), transaction internals short_vec."""
    c = _Cur(payload)
    n_entries = c.u64()
    entries = []
    for _ in range(n_entries):
        num_hashes = c.u64()
        entry_hash = c.take(32)
        n_txs = c.u64()
        txs = [_read_transaction(c) for _ in range(n_txs)]
        entries.append({"num_hashes": num_hashes,
                        "hash": entry_hash, "transactions": txs})
    return entries


def entries_to_rows(payload: bytes, slot: int, recv_us: int):
    """Entry -> raw transaction rows (E3, `shred_stream.rs:52-66`).

    Shreds carry no meta: block_time NULL, no inner instructions, and v0
    lookup addresses cannot be resolved without the address-table state,
    so loaded_* stay empty — exactly the reference's shred-path inputs
    (`core/event_parser.rs:144` inner_instructions = &[]).
    """
    tx_index = 0
    for entry in decode_entries(payload):
        for tx in entry["transactions"]:
            msg = tx["message"]
            yield {
                "slot": slot,
                "transaction_index": tx_index,
                "block_time": None,
                "signature": tx["signatures"][0] if tx["signatures"]
                else b58encode(b"\x00" * 64),
                "is_vote": False,
                "recv_us": recv_us,
                "static_account_keys": msg["account_keys"],
                "loaded_writable_addresses": [],
                "loaded_readonly_addresses": [],
                "instructions": msg["instructions"],
                "inner_instructions": [],
                "source": "shred",
            }
            tx_index += 1


# ---------------------------------------------------------------------------
# Live subscription plumbing (import-gated on grpc)
# ---------------------------------------------------------------------------


def build_subscribe_request(proto, options: dict):
    """Materialize the server-side filter as a yellowstone proto
    SubscribeRequest, given the generated proto module (duck-typed so the
    pure-dict form in `yellowstone.subscription_request` stays the single
    source of truth for WHAT is pushed down)."""
    from .yellowstone import subscription_request
    spec = subscription_request(options)
    req = proto.SubscribeRequest()
    commitment = spec.get("commitment", "processed").upper()
    req.commitment = getattr(proto.CommitmentLevel, commitment)
    if "transactions" in spec:
        f = spec["transactions"]["client"]
        req.transactions["client"].vote = f["vote"]
        req.transactions["client"].failed = f["failed"]
        req.transactions["client"].account_include.extend(
            f["account_include"])
        req.transactions["client"].account_exclude.extend(
            f["account_exclude"])
        req.transactions["client"].account_required.extend(
            f["account_required"])
    if "accounts" in spec:
        req.accounts["client"].owner.extend(spec["accounts"]["client"]
                                            ["owner"])
    if "blocks_meta" in spec:
        req.blocks_meta["client"].SetInParent()
    return req


# Backpressure presets mirroring `common/config.rs:139-183` (permits,
# strategy) and the default of `common/constants.rs:6`.
BACKPRESSURE_PRESETS = {
    "default": (1000, "block"),
    "low_latency": (4000, "block"),
    "high_throughput": (20000, "drop"),
}


class LiveSubscription:
    """Background gRPC consumer feeding a bounded deque the Structured
    Streaming reader drains per micro-batch — the pull-model adapter for
    the reference's push stream (`yellowstone_grpc.rs:183-275`).

    Backpressure (`common/config.rs:7-63,139-183`): strategy "block"
    (lossless — the gRPC thread waits when the reader falls behind) or
    "drop" (lossy — at-most-once; dropped messages are COUNTED, the A4
    dropped-event counter of `common/metrics.rs:517-553`). Select via
    options: backpressure=<preset name> or capacity=<n> +
    backpressureStrategy=<block|drop>.
    """

    def __init__(self, endpoint: str, options: dict, capacity: int = 20000):
        # NB: constructible without grpc (the buffer half is pure and
        # unit-tested); the start_* methods that open sockets are the
        # import gate.
        self.endpoint = endpoint
        self.options = options
        opts = {k.lower(): v for k, v in options.items()}
        preset = BACKPRESSURE_PRESETS.get(opts.get("backpressure", ""),
                                          (capacity, "block"))
        self.capacity = int(opts.get("capacity", preset[0]))
        self.strategy = opts.get("backpressurestrategy", preset[1])
        self.dropped = 0  # A4 counter (metrics.rs:517-553)
        self._buf: deque = deque()
        self._lock = threading.Lock()
        self._not_full = threading.Condition(self._lock)
        self._stopped = False
        self._thread: threading.Thread | None = None

    def _push(self, item) -> None:
        with self._not_full:
            if self.strategy == "drop":
                if len(self._buf) >= self.capacity:
                    self.dropped += 1  # at-most-once under Drop
                    return
                self._buf.append(item)
                return
            while len(self._buf) >= self.capacity and not self._stopped:
                self._not_full.wait(0.1)
            self._buf.append(item)

    def drain(self, max_items: int) -> list:
        with self._not_full:
            out = []
            while self._buf and len(out) < max_items:
                out.append(self._buf.popleft())
            self._not_full.notify_all()
            return out

    def stop(self) -> None:  # S6 lifecycle (`yellowstone_grpc.rs:110-118`)
        with self._not_full:
            self._stopped = True
            self._not_full.notify_all()

    def _require_grpc(self) -> None:
        try:
            import grpc  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no grpc in CI
            raise NotImplementedError(
                "live subscription requires the grpc package; use "
                "endpoint=simulate:// for the deterministic generator"
            ) from exc

    def start_yellowstone(self, proto, stub) -> None:  # pragma: no cover
        """Consume a Geyser subscribe stream; requires generated proto
        stubs (yellowstone-grpc-proto). Field mapping stays in the pure
        functions above — this loop only stamps recv_us and pushes."""
        import time

        self._require_grpc()

        request = build_subscribe_request(proto, self.options)

        def run():
            for update in stub.Subscribe(iter([request])):
                if self._stopped:
                    break
                recv_us = time.time_ns() // 1000
                d = _proto_to_dict(update)
                for kind, row in subscribe_update_to_rows(d, recv_us):
                    self._push((kind, row))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def start_shredstream(self, stub, request) -> None:  # pragma: no cover
        """Consume a ShredStream subscribe_entries stream
        (`shred/connection.rs:13-34`); each message carries (slot,
        bincode entries) decoded by the pure `entries_to_rows` above."""
        import time

        self._require_grpc()

        def run():
            for msg in stub.SubscribeEntries(request):
                if self._stopped:
                    break
                recv_us = time.time_ns() // 1000
                for row in entries_to_rows(bytes(msg.entries), int(msg.slot),
                                           recv_us):
                    self._push(("transaction", row))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()


def _proto_to_dict(update):  # pragma: no cover - requires protobuf msgs
    """Minimal proto -> dict adapter preserving bytes fields (MessageToDict
    base64-encodes bytes, which the mapping functions don't want)."""
    out = {}
    for field, value in update.ListFields():
        name = field.name
        if field.type == field.TYPE_MESSAGE:
            if field.label == field.LABEL_REPEATED:
                out[name] = [_proto_to_dict(v) for v in value]
            else:
                out[name] = _proto_to_dict(value)
        elif field.label == field.LABEL_REPEATED:
            out[name] = list(value)
        else:
            out[name] = value
    return out
