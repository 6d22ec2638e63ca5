"""Completeness gate over the J1 merge-spec registry.

The reference's merger (core/merger_event.rs:3-374) carries one merge
spec per mergeable event type; a CPI discriminator that no spec consumes
would silently decode events that never merge. These gates pin the
three-way consistency between INNER_DISCRIMINATORS, MERGE_SPECS, the
instruction decoder registry, and the event schema, so adding a protocol
without wiring all four fails loudly here instead of producing quietly
unmerged events.
"""

from __future__ import annotations

from solana_event_stream_spark.registry import (INNER_DISCRIMINATORS,
                                                MERGE_SPECS)

# CPI kinds that are registered but intentionally never merged.
# (none today — every inner discriminator feeds at least one spec)
NO_MERGE_EXEMPT: frozenset[str] = frozenset()

# Merge specs whose CPI kind has no registered discriminator — kept for
# reference parity only. BonkMigrateToAmm merges from a
# BonkMigrateToAmmEvent CPI (merger_event.rs:108-115), but Bonk registers
# no such discriminator, so the spec is unreachable by construction.
UNREACHABLE_SPEC_KINDS: frozenset[str] = frozenset({"bonk_trade_unused"})


def test_every_cpi_kind_feeds_a_merge_spec():
    kinds = set(INNER_DISCRIMINATORS.values())
    consumed = {spec[0] for spec in MERGE_SPECS.values()}
    orphans = kinds - consumed - NO_MERGE_EXEMPT
    assert not orphans, (
        f"CPI kinds with a registered discriminator but no merge spec "
        f"(add a MERGE_SPECS entry or an explicit NO_MERGE_EXEMPT): "
        f"{sorted(orphans)}")


def test_every_merge_spec_kind_has_a_discriminator_or_exemption():
    kinds = set(INNER_DISCRIMINATORS.values())
    for event_type, (cpi_kind, _) in MERGE_SPECS.items():
        assert cpi_kind in kinds or cpi_kind in UNREACHABLE_SPEC_KINDS, (
            f"MERGE_SPECS[{event_type}] expects CPI kind {cpi_kind!r} "
            f"which has no INNER_DISCRIMINATORS entry and no "
            f"documented unreachable-spec exemption")


def test_every_merge_spec_event_type_has_an_instruction_decoder():
    from solana_event_stream_spark.operators.decode import (
        INSTRUCTION_DECODERS)
    missing = set(MERGE_SPECS) - set(INSTRUCTION_DECODERS)
    assert not missing, (
        f"MERGE_SPECS entries whose event type has no instruction "
        f"decoder (the spec could never fire): {sorted(missing)}")


def test_merge_fields_are_nonempty_and_exist_in_event_schema():
    from solana_event_stream_spark.schemas import EVENT_SCHEMA
    schema_fields = set(EVENT_SCHEMA.fieldNames())
    for event_type, (cpi_kind, fields) in MERGE_SPECS.items():
        assert fields, f"MERGE_SPECS[{event_type}] has an empty field list"
        unknown = set(fields) - schema_fields
        assert not unknown, (
            f"MERGE_SPECS[{event_type}] overwrites fields missing from "
            f"EVENT_SCHEMA (the merge result would be dropped at the "
            f"Arrow boundary): {sorted(unknown)}")


def test_every_cpi_kind_has_a_cpi_decoder():
    from solana_event_stream_spark.operators.decode import CPI_DECODERS
    missing = set(INNER_DISCRIMINATORS.values()) - set(CPI_DECODERS)
    assert not missing, (
        f"CPI kinds dispatched by INNER_DISCRIMINATORS but not decodable "
        f"(J1 candidates would always fail to decode): {sorted(missing)}")
