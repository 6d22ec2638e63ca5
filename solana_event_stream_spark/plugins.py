"""Protocol plug-in registration (SURVEY §2.11 extensibility contract).

The reference adds a protocol by registering data — program id,
discriminators, a decoder, optionally CPI events and a merge spec
(e.g. the per-protocol modules under
/root/reference/src/streaming/event_parser/protocols/) — with no
engine change. This module is the engine-side realization of that
contract for the Spark pipeline: :func:`register_protocol` mutates the
shared registries, and every consumer resolves them at PLAN-BUILD
time (plans/pipeline.py builds its dispatch maps from the registry
dicts per plan, captures the decoder tables into the mapInArrow
closure for executors, and derives the event schema via
`schemas.event_schema()`), so a freshly registered protocol flows
through F1/D1 dispatch, P5 decode, J1 CPI merge, F9, the event schema
and the lake with zero engine edits.

Scope: protocols with 8-byte Anchor-style discriminators, 16-byte
inner (CPI) discriminators, and 8-byte account-state discriminators —
the layout every reference protocol except Raydium AMM v4 uses. A
plug-in can register BOTH halves of a reference protocol module: the
instruction/CPI side (F1/D1/P5/J1/F9) and the account-state side (D3 —
``account_discriminators``/``account_decoders``, routed by
plans/account_pipeline.build_account_events exactly like the builtin
twelve). Plug-ins decode
on the per-row path by default; pass ``vector_specs`` (declarative
decode_vec.InstSpec layouts) to put a HOT plug-in on the vectorized
fast path — the specs register into decode_vec.SPECS behind the same
drift gate the builtin table passes, ship to executors in the decode
closure, and unregister with everything else.

Returns an ``unregister`` callable that restores the registries
exactly — primarily for tests; production registration is
process-lifetime.
"""

from __future__ import annotations

from typing import Callable

from . import registry, schemas
from .operators import decode
from .registry import INNER_DISC_LEN


def register_protocol(name: str,
                      program_id: str,
                      instruction_discriminators: dict[str, str],
                      instruction_decoders: dict[str, Callable],
                      payload_fields: dict[str, str],
                      inner_discriminators: dict[str, str] | None = None,
                      cpi_decoders: dict[str, Callable] | None = None,
                      merge_specs: dict[str, tuple[str, list[str]]]
                      | None = None,
                      requires_cpi: tuple[str, ...] = (),
                      vector_specs: dict | None = None,
                      account_discriminators: dict[str, str] | None = None,
                      account_decoders: dict[str, Callable] | None = None,
                      account_payload_fields: dict[str, str] | None = None
                      ) -> Callable[[], None]:
    """Register a protocol: pure data + decoders, no engine change.

    - ``instruction_discriminators``: lowercase-hex 8-byte discriminator
      -> event type name (D1 dispatch).
    - ``instruction_decoders``: event type -> fn(data_after_disc,
      resolved_accounts) -> dict | None (P5; F7 semantics: None on any
      malformed input, never raise).
    - ``payload_fields``: field name -> kind (schemas._KIND_TO_SPARK
      keys). Re-using an existing field name requires the same kind.
    - ``inner_discriminators`` / ``cpi_decoders``: 16-byte hex -> CPI
      kind, and kind -> fn(body) -> dict | None (J1).
    - ``merge_specs``: event type -> (cpi kind, fields to overwrite).
    - ``requires_cpi``: event types dropped without a decoded CPI (F9).
    - ``account_discriminators`` / ``account_decoders`` /
      ``account_payload_fields``: the ACCOUNT-STATE half of a reference
      protocol module (e.g. pumpfun/types.rs:35-57's bonding-curve
      parser dispatched at core/dispatcher.rs:248-288) — 8-byte account
      discriminator hex -> account event type, type -> fn(data) ->
      dict | None (same F7 semantics), and any NEW output columns as
      field -> kind. A registered protocol's account updates then route
      through D3 (plans/account_pipeline.build_account_events) with no
      engine edit: the dispatch map, decoder table, and account schema
      all resolve at plan-build time. Reusing a base account-schema
      column requires the matching kind.
    - ``vector_specs``: event type -> ``decode_vec.InstSpec`` declaring
      the FIXED Borsh layout, for hot plug-ins: spec-covered rows then
      decode on the vectorized fast path (NumPy gathers, no per-row
      Python) exactly like builtin types — without this a plug-in
      always pays the per-row path (~3.4x at ingest). The spec must
      agree with the per-row decoder bit for bit (same offsets, same
      guards); the ``decode_vec._check_specs`` drift gate runs here
      against the plug-in's merge specs, and requires_cpi flags must
      match. Differential-test any vector spec the way
      tests/test_plugin_protocol.py does.
    """
    inner_discriminators = inner_discriminators or {}
    cpi_decoders = cpi_decoders or {}
    merge_specs = merge_specs or {}
    account_discriminators = account_discriminators or {}
    account_decoders = account_decoders or {}
    account_payload_fields = account_payload_fields or {}

    # ---- validation: loud failure BEFORE any mutation ------------------
    if name in registry.PROGRAM_ID_BY_PROTOCOL:
        raise ValueError(f"protocol {name!r} already registered")
    if program_id in registry.PROTOCOL_BY_PROGRAM_ID:
        raise ValueError(f"program id {program_id} already registered")
    for disc in instruction_discriminators:
        if len(disc) != 16 or disc != disc.lower():
            raise ValueError(
                f"instruction discriminator {disc!r} must be 8 bytes of "
                f"lowercase hex (Raydium-AMM-v4-style 1-byte "
                f"discriminators are not pluggable)")
    for disc in inner_discriminators:
        if len(disc) != 2 * INNER_DISC_LEN or disc != disc.lower():
            raise ValueError(f"inner discriminator {disc!r} must be "
                             f"{INNER_DISC_LEN} bytes of lowercase hex")
    etypes = set(instruction_discriminators.values())
    if etypes != set(instruction_decoders):
        raise ValueError("instruction_decoders keys must equal the "
                         "discriminator event types")
    if etypes & set(decode.INSTRUCTION_DECODERS):
        raise ValueError("event type collides with a registered decoder: "
                         f"{sorted(etypes & set(decode.INSTRUCTION_DECODERS))}")
    kinds = set(inner_discriminators.values())
    if kinds != set(cpi_decoders):
        raise ValueError("cpi_decoders keys must equal the inner-"
                         "discriminator kinds")
    if kinds & set(decode.CPI_DECODERS):
        raise ValueError("CPI kind collides with a registered decoder")
    for field, kind in payload_fields.items():
        if kind not in schemas._KIND_TO_SPARK:
            raise ValueError(f"unknown field kind {kind!r} for {field!r}")
        have = schemas.PAYLOAD_FIELDS.get(field)
        if have is not None and have != kind:
            raise ValueError(
                f"field {field!r} already registered with kind {have!r}")
        if field in schemas.METADATA_COL_NAMES:
            raise ValueError(f"field {field!r} shadows a metadata column")
    all_fields = set(schemas.PAYLOAD_FIELDS) | set(payload_fields)
    for etype, (kind, fields) in merge_specs.items():
        if etype not in etypes:
            raise ValueError(f"merge spec for unregistered type {etype!r}")
        if kind not in kinds:
            raise ValueError(f"merge spec {etype!r} expects unregistered "
                             f"CPI kind {kind!r}")
        if not fields or not set(fields) <= all_fields:
            raise ValueError(f"merge spec {etype!r} fields must be "
                             f"non-empty registered payload fields")
    if not set(requires_cpi) <= etypes:
        raise ValueError("requires_cpi entries must be registered types")
    from .operators import account_decode as _acct
    from .plans.account_pipeline import ACCOUNT_EVENT_SCHEMA
    for disc in account_discriminators:
        # hex-ness is checked too (ADVICE r11): a typo like 'g0e1...'
        # would register fine but never match data.hex() — a silently
        # dead account route.
        if (len(disc) != 16 or disc != disc.lower()
                or any(c not in "0123456789abcdef" for c in disc)):
            raise ValueError(f"account discriminator {disc!r} must be "
                             "8 bytes of lowercase hex (the no-disc "
                             "AMM-v4-style dispatch is not pluggable)")
    acct_types = set(account_discriminators.values())
    if acct_types != set(account_decoders):
        raise ValueError("account_decoders keys must equal the account-"
                         "discriminator event types")
    if acct_types & set(_acct.PROTOCOL_ACCOUNT_DECODERS):
        raise ValueError(
            "account event type collides with a registered decoder: "
            f"{sorted(acct_types & set(_acct.PROTOCOL_ACCOUNT_DECODERS))}")
    if account_payload_fields and not acct_types:
        raise ValueError("account_payload_fields without account_decoders")
    acct_base_types = {f.name: f.dataType for f in ACCOUNT_EVENT_SCHEMA}
    new_acct_fields: list[str] = []
    for field, kind in account_payload_fields.items():
        spark_t = schemas._KIND_TO_SPARK.get(kind)
        if spark_t is None:
            raise ValueError(
                f"unknown account field kind {kind!r} for {field!r}")
        if field in acct_base_types:
            if acct_base_types[field] != spark_t:
                raise ValueError(
                    f"account field {field!r} exists in the base schema "
                    f"as {acct_base_types[field]}; kind {kind!r} maps to "
                    f"{spark_t}")
            continue  # reuse of a base column: nothing to register
        have = _acct.ACCOUNT_PLUGIN_FIELDS.get(field)
        if have is not None and have != kind:
            raise ValueError(f"account field {field!r} already "
                             f"registered with kind {have!r}")
        if have is None:
            new_acct_fields.append(field)
    if vector_specs:
        from .operators import decode_vec
        if not set(vector_specs) <= etypes:
            raise ValueError("vector_specs keys must be registered "
                             "instruction event types: "
                             f"{sorted(set(vector_specs) - etypes)}")
        for etype, spec in vector_specs.items():
            if not isinstance(spec, decode_vec.InstSpec):
                raise ValueError(f"vector spec for {etype!r} must be a "
                                 "decode_vec.InstSpec")
            if spec.disc_len != 8:
                raise ValueError(f"vector spec {etype!r}: pluggable "
                                 "protocols use 8-byte discriminators")
            if bool(spec.requires_cpi) != (etype in requires_cpi):
                raise ValueError(
                    f"vector spec {etype!r}: requires_cpi flag disagrees "
                    "with the protocol registration — the two paths "
                    "would drop different rows")
            if spec.cpi is not None and spec.cpi.kind not in kinds:
                raise ValueError(
                    f"vector spec {etype!r}: CPI kind {spec.cpi.kind!r} "
                    "is not one of this protocol's inner kinds")
        # same gate the builtin table passes at import time, against
        # the merge specs being registered — BEFORE any mutation
        decode_vec._check_specs(vector_specs, merge_specs)

    # ---- executor-side serialization ----------------------------------
    # The decode tables ship to executors inside the mapInArrow closure
    # (pipeline._decode_tables). Builtin decoders pickle by reference
    # (their modules are installed on the workers); plug-in decoders
    # live in modules only the DRIVER can import, so their origin
    # modules must pickle by value. Spark serializes UDF closures with
    # its vendored cloudpickle — register there.
    import sys

    from pyspark import cloudpickle as _cp

    engine_pkg = __name__.rsplit(".", 1)[0]
    plugin_modules = sorted(
        m for m in {fn.__module__
                    for fn in list(instruction_decoders.values())
                    + list(cpi_decoders.values())
                    + list(account_decoders.values())}
        if not m.startswith(engine_pkg) and m in sys.modules)
    for m in plugin_modules:
        _cp.register_pickle_by_value(sys.modules[m])

    # ---- mutation (in-place where consumers hold the dict) -------------
    pre_existing_fields = set(schemas.PAYLOAD_FIELDS)
    registry.PROTOCOL_BY_PROGRAM_ID[program_id] = name
    registry.PROGRAM_ID_BY_PROTOCOL[name] = program_id
    registry.ALL_PROTOCOLS = tuple(registry.PROGRAM_ID_BY_PROTOCOL)
    for disc, etype in instruction_discriminators.items():
        registry.INSTRUCTION_DISCRIMINATORS[(name, disc)] = etype
    for disc, kind in inner_discriminators.items():
        registry.INNER_DISCRIMINATORS[(name, disc)] = kind
    registry.MERGE_SPECS.update(merge_specs)
    registry.REQUIRES_CPI = tuple(registry.REQUIRES_CPI) + tuple(
        requires_cpi)
    decode.INSTRUCTION_DECODERS.update(instruction_decoders)
    decode.CPI_DECODERS.update(cpi_decoders)
    schemas.PAYLOAD_FIELDS.update(payload_fields)
    schemas.EVENT_SCHEMA = schemas.event_schema()
    if vector_specs:
        from .operators import decode_vec
        decode_vec.register_specs(vector_specs, merge_specs)
    for disc, aet in account_discriminators.items():
        _acct.ACCOUNT_DISCRIMINATORS[(name, disc)] = aet
    _acct.PROTOCOL_ACCOUNT_DECODERS.update(account_decoders)
    for field in new_acct_fields:
        _acct.ACCOUNT_PLUGIN_FIELDS[field] = account_payload_fields[field]

    new_fields = [f for f in payload_fields
                  if f not in pre_existing_fields]

    def unregister() -> None:
        if vector_specs:
            from .operators import decode_vec
            decode_vec.unregister_specs(vector_specs)
        registry.PROTOCOL_BY_PROGRAM_ID.pop(program_id, None)
        registry.PROGRAM_ID_BY_PROTOCOL.pop(name, None)
        registry.ALL_PROTOCOLS = tuple(registry.PROGRAM_ID_BY_PROTOCOL)
        for disc in instruction_discriminators:
            registry.INSTRUCTION_DISCRIMINATORS.pop((name, disc), None)
        for disc in inner_discriminators:
            registry.INNER_DISCRIMINATORS.pop((name, disc), None)
        for etype in merge_specs:
            registry.MERGE_SPECS.pop(etype, None)
        registry.REQUIRES_CPI = tuple(
            t for t in registry.REQUIRES_CPI if t not in requires_cpi)
        for etype in instruction_decoders:
            decode.INSTRUCTION_DECODERS.pop(etype, None)
        for kind in cpi_decoders:
            decode.CPI_DECODERS.pop(kind, None)
        for field in new_fields:
            schemas.PAYLOAD_FIELDS.pop(field, None)
        schemas.EVENT_SCHEMA = schemas.event_schema()
        for disc in account_discriminators:
            _acct.ACCOUNT_DISCRIMINATORS.pop((name, disc), None)
        for aet in account_decoders:
            _acct.PROTOCOL_ACCOUNT_DECODERS.pop(aet, None)
        for field in new_acct_fields:
            _acct.ACCOUNT_PLUGIN_FIELDS.pop(field, None)
        for m in plugin_modules:
            if m in sys.modules:
                _cp.unregister_pickle_by_value(sys.modules[m])

    return unregister
